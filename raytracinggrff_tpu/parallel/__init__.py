from .mesh import make_mesh, shard_rays, shard_freqs, replicate

__all__ = ["make_mesh", "shard_rays", "shard_freqs", "replicate"]
