from .nanpatch import patch_nan_emission_map
from .beam import gaussian_beam_convolve

__all__ = ["patch_nan_emission_map", "gaussian_beam_convolve"]
