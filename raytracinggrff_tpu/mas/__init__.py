from .hdf4 import read_hdf4_sds, write_hdf4_sds
from .model import MASModel, MASVariable, load_mas_var, synthetic_mas_model

__all__ = ["read_hdf4_sds", "write_hdf4_sds", "MASModel", "MASVariable",
           "load_mas_var", "synthetic_mas_model"]
