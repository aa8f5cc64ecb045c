"""Gyroresonance opacity (mechanism flag 2): resonance-layer behavior."""

import numpy as np

from raytracinggrff_tpu.grff.physics import gyroresonance_kappa
from raytracinggrff_tpu.grff.transfer import grff_transfer

AREA = (0.045 * 6.957e10) ** 2


def test_resonance_layers():
    """Opacity peaks where nu = s * nu_B and is negligible off-resonance."""
    b = 100.0                     # G -> nu_B ~ 280 MHz
    nu_b = 2.7992e6 * b
    ne, te = 1e9, 2e6
    theta = np.deg2rad(45.0)
    for s in (2, 3):
        on = float(gyroresonance_kappa(np.float64(ne), np.float64(te),
                                       np.float64(b), s * nu_b, theta,
                                       -1.0, xp=np))
        off = float(gyroresonance_kappa(np.float64(ne), np.float64(te),
                                        np.float64(b), (s + 0.5) * nu_b,
                                        theta, -1.0, xp=np))
        assert on > 1e3 * max(off, 1e-30)
    # low harmonics are far more opaque than high ones
    k2 = float(gyroresonance_kappa(np.float64(ne), np.float64(te),
                                   np.float64(b), 2 * nu_b, theta, -1.0,
                                   xp=np))
    k5 = float(gyroresonance_kappa(np.float64(ne), np.float64(te),
                                   np.float64(b), 5 * nu_b, theta, -1.0,
                                   xp=np))
    assert k2 > 1e3 * k5


def test_x_mode_more_opaque_than_o():
    b, ne, te = 100.0, 1e9, 2e6
    nu = 3 * 2.7992e6 * b
    theta = np.deg2rad(45.0)
    kx = float(gyroresonance_kappa(np.float64(ne), np.float64(te),
                                   np.float64(b), nu, theta, -1.0, xp=np))
    ko = float(gyroresonance_kappa(np.float64(ne), np.float64(te),
                                   np.float64(b), nu, theta, 1.0, xp=np))
    assert kx > ko > 0


def test_transfer_with_gr_flag():
    """mechanism=1+2+4 adds gyroresonance absorption to the transfer; an
    optically thin free-free slab becomes optically thick at a resonance."""
    nz, n_pix = 10, 1
    b = 100.0
    nu = np.array([3 * 2.7992e6 * b])   # third harmonic
    ds = np.full((nz, n_pix), 1e8)
    te = np.full((nz, n_pix), 2e6)
    ne = np.full((nz, n_pix), 1e9)
    bb = np.full((nz, n_pix), b)
    valid = np.ones((nz, n_pix), bool)
    ff = grff_transfer(ds, te, ne, bb, valid, nu, AREA, theta_deg=45.0,
                       mechanism=1)
    gr = grff_transfer(ds, te, ne, bb, valid, nu, AREA, theta_deg=45.0,
                       mechanism=1 + 2 + 4)
    assert float(gr.tau_x[0, 0]) > 10 * float(ff.tau_x[0, 0])
    assert float(gr.flux_x[0, 0]) > float(ff.flux_x[0, 0])
