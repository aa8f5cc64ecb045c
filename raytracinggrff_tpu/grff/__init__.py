from .transfer import (GrffResult, get_mw, get_mw_slice, grff_transfer,
                       tb_from_sfu)
from . import physics

__all__ = ["GrffResult", "get_mw", "get_mw_slice", "grff_transfer",
           "tb_from_sfu", "physics"]
