"""TPU hardware constants for roofline accounting.

HBM peak bandwidths per chip (public figures from Google's TPU system
documentation / the scaling-book). Used to report achieved-bandwidth
fractions; BASELINE.json targets >=80% of HBM speed-of-light on probe.
"""
from __future__ import annotations

import jax

_HBM_GBPS = {
    # device_kind substring -> GB/s per chip
    "v6": 1640.0,       # Trillium
    "v5p": 2765.0,
    "v5": 819.0,        # v5e / "TPU v5 lite"
    "lite": 819.0,
    "v4": 1228.0,
    "v3": 900.0,
    "v2": 700.0,
}


def hbm_peak_gbps(device=None) -> float:
    """Best-effort HBM peak for the attached chip; 0 means unknown (CPU)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind.lower() and device.platform not in ("tpu", "axon"):
        return 0.0
    for marker, bw in _HBM_GBPS.items():
        if marker in kind:
            return bw
    return 0.0
