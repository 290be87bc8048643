from tpujoin.core.table import Table
from tpujoin.core.config import JoinConfig, PRESETS

__all__ = ["Table", "JoinConfig", "PRESETS"]
