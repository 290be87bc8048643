from tpujoin.parallel.mesh import make_mesh
from tpujoin.parallel.shuffle_join import distributed_hash_join

__all__ = ["make_mesh", "distributed_hash_join"]
