"""Minimal FITS image reader (no astropy dependency).

Covers what the observation-comparison workflows need (the reference loads
OVRO-LWA / suncasa FITS images via astropy in script/pub/compare_ovro_*.py):
uncompressed primary-HDU (or first image-extension) N-D image data with
BSCALE/BZERO, plus the header cards needed for solar plate-scale geometry
(CDELTn, CRPIXn, CRVALn, NAXISn).
"""

from __future__ import annotations

import numpy as np

_BLOCK = 2880

_BITPIX_DTYPE = {
    8: np.dtype(">u1"), 16: np.dtype(">i2"), 32: np.dtype(">i4"),
    64: np.dtype(">i8"), -32: np.dtype(">f4"), -64: np.dtype(">f8"),
}


def _parse_header(buf, pos):
    """Parse one header unit starting at pos; returns (cards, new_pos)."""
    cards = {}
    while True:
        block = buf[pos:pos + _BLOCK]
        if len(block) < _BLOCK:
            raise ValueError("truncated FITS header")
        pos += _BLOCK
        done = False
        for i in range(0, _BLOCK, 80):
            card = block[i:i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if "=" not in card[8:10]:
                continue
            val = card[10:].split("/")[0].strip()
            if val.startswith("'"):
                cards[key] = val.strip("'").strip()
            elif val in ("T", "F"):
                cards[key] = val == "T"
            else:
                try:
                    cards[key] = int(val)
                except ValueError:
                    try:
                        cards[key] = float(val)
                    except ValueError:
                        cards[key] = val
        if done:
            break
    return cards, pos


def read_fits_image(path):
    """Read the first HDU containing image data.

    Returns (data ndarray with NAXIS axes reversed (C order), header dict).
    """
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    while pos < len(buf):
        header, pos = _parse_header(buf, pos)
        naxis = int(header.get("NAXIS", 0))
        shape = [int(header[f"NAXIS{i}"]) for i in range(naxis, 0, -1)]
        n_items = int(np.prod(shape)) if shape else 0
        bitpix = int(header.get("BITPIX", 8))
        itemsize = abs(bitpix) // 8
        nbytes = n_items * itemsize
        if n_items > 0:
            dtype = _BITPIX_DTYPE[bitpix]
            data = np.frombuffer(buf[pos:pos + nbytes], dtype=dtype,
                                 count=n_items).reshape(shape)
            data = data.astype(np.float64)
            bscale = float(header.get("BSCALE", 1.0))
            bzero = float(header.get("BZERO", 0.0))
            if bscale != 1.0 or bzero != 0.0:
                data = data * bscale + bzero
            return data, header
        # skip any (empty) data unit, aligned to blocks
        pos += -(-nbytes // _BLOCK) * _BLOCK
    raise ValueError(f"no image HDU found in {path}")


def load_observation_map(path):
    """Load a 2D observation map from .fits or .npz.

    npz convention: keys 'map' (2D) and optionally 'x_coords'/'y_coords'
    (meters, as the framework writes). FITS maps are squeezed to 2D.
    Returns (map2d, x_coords_m or None, y_coords_m or None, meta dict).
    """
    path = str(path)
    if path.endswith((".fits", ".fts", ".fit")):
        data, header = read_fits_image(path)
        img = np.squeeze(data)
        if img.ndim != 2:
            raise ValueError(f"FITS data is {img.ndim}-D after squeeze")
        return img, None, None, dict(header)
    data = np.load(path)
    if "map" in data:
        img = data["map"]
    elif "emission_cube" in data:
        img = data["emission_cube"][:, :, 0]
    else:
        raise KeyError("npz must contain 'map' or 'emission_cube'")
    return (img, data.get("x_coords"), data.get("y_coords"),
            {k: None for k in data.files})
