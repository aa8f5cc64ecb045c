from .trilinear import pack_fields, trilinear_packed, trilinear_sample

__all__ = ["pack_fields", "trilinear_packed", "trilinear_sample"]
