"""Float64 NumPy reference implementation of the GRFF transfer.

This is the framework's "CPU reference" for brightness-temperature parity
(BASELINE.md target: TPU path within <= 1% of the CPU reference). It evaluates
the identical physics (grff/physics.py with xp=numpy) in float64 with an
explicit per-voxel loop — the same role the external GRFF_DEM_Transfer.so
plays for the reference repo.
"""

from __future__ import annotations

import numpy as np

from ..constants import AU_CM, C_CGS, KB_CGS, SFU2CGS
from .physics import O_MODE, X_MODE, freefree_kappa


def grff_transfer_reference(ds, te, ne, b, valid, freqs_hz, pixel_area_cm2,
                            s_area_cm2=None, theta_deg=90.0,
                            include_neutrals=True):
    """Same contract as transfer.grff_transfer, computed in float64.

    Returns dict with flux_o, flux_x (n_pix, Nf) in SFU and tau_o, tau_x.
    """
    ds = np.asarray(ds, np.float64)
    te = np.asarray(te, np.float64)
    ne = np.asarray(ne, np.float64)
    b = np.asarray(b, np.float64)
    valid = np.asarray(valid, bool)
    freqs = np.asarray(freqs_hz, np.float64)
    theta = np.deg2rad(theta_deg)
    nz, n_pix = ds.shape
    nf = freqs.shape[0]
    if s_area_cm2 is None:
        s_area_cm2 = np.zeros_like(ds)
    else:
        s_area_cm2 = np.asarray(s_area_cm2, np.float64)

    src_coef = (KB_CGS / C_CGS ** 2 * freqs ** 2 / AU_CM ** 2 / SFU2CGS)

    flux = {O_MODE: np.zeros((n_pix, nf)), X_MODE: np.zeros((n_pix, nf))}
    tau_tot = {O_MODE: np.zeros((n_pix, nf)), X_MODE: np.zeros((n_pix, nf))}

    for k in range(nz):
        mask = (valid[k] & np.isfinite(ne[k]) & np.isfinite(te[k])
                & np.isfinite(b[k]) & np.isfinite(ds[k]) & (ds[k] > 0))
        if not np.any(mask):
            continue
        area = np.where(s_area_cm2[k] > 0, s_area_cm2[k], pixel_area_cm2)
        for sigma in (O_MODE, X_MODE):
            kappa, n2 = freefree_kappa(
                np.where(mask, ne[k], 1.0)[:, None],
                np.where(mask, te[k], 1e6)[:, None],
                np.where(mask, b[k], 0.0)[:, None],
                freqs[None, :], theta, sigma,
                include_neutrals=include_neutrals, xp=np)
            tau = np.where(mask[:, None], kappa * ds[k][:, None], 0.0)
            tau = np.where(np.isfinite(tau), tau, 0.0)
            evan = mask[:, None] & (n2 <= 0.0)
            att = np.exp(-tau)
            src = (np.where(mask, te[k], 0.0)[:, None]
                   * src_coef[None, :] * area[:, None])
            f = flux[sigma] * att + src * (1.0 - att)
            flux[sigma] = np.where(evan, 0.0, f)
            tau_tot[sigma] = np.where(evan, np.inf, tau_tot[sigma] + tau)

    return {
        "freqs_ghz": freqs / 1e9,
        "flux_o": flux[O_MODE], "flux_x": flux[X_MODE],
        "tau_o": tau_tot[O_MODE], "tau_x": tau_tot[X_MODE],
    }
