"""Native C++ GRFF library vs the float64 NumPy reference and the JAX path.

The .so exposes the reference's exact PyGET_MW ctypes ABI
(script/synthetic_FF_map_single_thread.py:27-35), making it a drop-in
replacement for the missing external GRFF_DEM_Transfer.so binary."""

import shutil

import numpy as np
import pytest

from raytracinggrff_tpu.grff.reference import grff_transfer_reference
from raytracinggrff_tpu.grff.transfer import get_mw

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")

AREA = (0.045 * 6.957e10) ** 2


def _pack(ds, te, ne, b, s_area=None, theta=90.0, mech=5):
    nz = len(ds)
    parms = np.zeros((15, nz), order="F")
    parms[0], parms[1], parms[2], parms[3] = ds, te, ne, b
    parms[4] = theta
    parms[6] = mech
    parms[7] = 30
    if s_area is not None:
        parms[14] = s_area
    return parms


def test_native_matches_numpy_reference():
    from raytracinggrff_tpu.grff.native import get_mw_native
    rng = np.random.default_rng(0)
    nz, nf = 60, 4
    ds = rng.uniform(5e8, 5e9, nz)
    te = 10 ** rng.uniform(4.2, 6.5, nz)
    ne = 10 ** rng.uniform(6.0, 9.0, nz)
    b = rng.uniform(0.0, 5.0, nz)
    s_area = np.where(rng.uniform(size=nz) > 0.5,
                      AREA * rng.uniform(0.5, 2.0, nz), 0.0)
    lparms = np.array([nz, nf, 0, 0, 0], np.int32)
    rparms = np.array([AREA, 400e6, 0.15])

    rl = get_mw_native(lparms, rparms, _pack(ds, te, ne, b, s_area))

    ref = grff_transfer_reference(
        ds[:, None], te[:, None], ne[:, None], b[:, None],
        np.ones((nz, 1), bool),
        400e6 * 10 ** (0.15 * np.arange(nf)), AREA,
        s_area_cm2=s_area[:, None])
    np.testing.assert_allclose(rl[5], ref["flux_o"][0], rtol=1e-10)
    np.testing.assert_allclose(rl[6], ref["flux_x"][0], rtol=1e-10)
    np.testing.assert_allclose(rl[0],
                               400e-3 * 10 ** (0.15 * np.arange(nf)),
                               rtol=1e-12)


def test_native_matches_jax_get_mw():
    from raytracinggrff_tpu.grff.native import get_mw_native
    nz, nf = 30, 3
    parms = _pack(np.full(nz, 2e9), np.full(nz, 1e6), np.full(nz, 3e8),
                  np.full(nz, 2.0))
    lparms = np.array([nz, nf, 0, 0, 0], np.int32)
    rparms = np.array([AREA, 300e6, 0.1])
    rl_native = get_mw_native(lparms, rparms, parms)
    rl_jax = get_mw(lparms, rparms, parms)
    np.testing.assert_allclose(rl_native[5], rl_jax[5], rtol=2e-3)
    np.testing.assert_allclose(rl_native[6], rl_jax[6], rtol=2e-3)


def test_native_reference_script_style_call():
    """Exercise the exact reference calling convention (ctypes, F-order
    arrays, dummy T/DEM/DDM scalars; synthetic_FF_map_single_thread.py
    :189-219)."""
    from raytracinggrff_tpu.grff.native import init_get_mw
    import numpy as np
    GET_MW = init_get_mw()
    nz, nf = 20, 2
    parms = np.asfortranarray(_pack(np.full(nz, 1e9), np.full(nz, 1.5e6),
                                    np.full(nz, 5e8), np.full(nz, 1.0)))
    lparms = np.asfortranarray(np.array([nz, nf, 0, 0, 0], np.int32))
    rparms = np.asfortranarray(np.array([AREA, 400e6, 0.1]))
    dummy = np.asfortranarray(np.zeros(1))
    rl = np.zeros((7, nf), order="F")
    res = GET_MW(lparms, rparms, parms, dummy, dummy, dummy, rl)
    assert res == 0
    assert np.all(rl[5] > 0) and np.all(rl[6] > 0)

def test_native_gyroresonance_matches_jax():
    """mech flag 2 (gyroresonance) must be honored by the .so, not silently
    dropped — harmonic layers near s*nu_B change both mode fluxes."""
    from raytracinggrff_tpu.grff.native import get_mw_native
    nz, nf = 5, 3
    parms = _pack(np.full(nz, 1e8), np.full(nz, 2e6), np.full(nz, 1e9),
                  np.full(nz, 200.0), theta=60.0, mech=1 + 2 + 4)
    lparms = np.array([nz, nf, 0, 0, 0], np.int32)
    rparms = np.array([1e18, 1.0e9, 0.05])
    rl_native = get_mw_native(lparms, rparms, parms)
    rl_jax = get_mw(lparms, rparms, parms)
    np.testing.assert_allclose(rl_native[5], rl_jax[5], rtol=2e-2)
    np.testing.assert_allclose(rl_native[6], rl_jax[6], rtol=2e-2)

    parms_ff = _pack(np.full(nz, 1e8), np.full(nz, 2e6), np.full(nz, 1e9),
                     np.full(nz, 200.0), theta=60.0, mech=1 + 4)
    rl_ff = get_mw_native(lparms, rparms, parms_ff)
    assert np.max(np.abs(rl_native[5] - rl_ff[5])) > 0


def test_get_mw_per_voxel_theta():
    """Parms[4] may vary along the LOS (real GET_MW ABI); voxel-0-only
    shortcuts would silently ignore the variation."""
    nz, nf = 12, 2
    parms = _pack(np.full(nz, 2e9), np.full(nz, 1.2e6), np.full(nz, 4e8),
                  np.full(nz, 3.0), theta=90.0, mech=1 + 4)
    lparms = np.array([nz, nf, 0, 0, 0], np.int32)
    rparms = np.array([AREA, 200e6, 0.1])
    rl_uniform = get_mw(lparms, rparms, parms)
    parms_var = parms.copy()
    parms_var[4] = np.linspace(20.0, 90.0, nz)
    rl_var = get_mw(lparms, rparms, parms_var)
    assert np.max(np.abs(rl_var[5] - rl_uniform[5])) > 0
    # per-voxel uniform column equals the scalar path exactly
    parms_same = parms.copy()
    parms_same[4, :] = 47.5
    rl_a = get_mw(lparms, rparms, parms_same)
    parms_scalar = _pack(np.full(nz, 2e9), np.full(nz, 1.2e6),
                         np.full(nz, 4e8), np.full(nz, 3.0),
                         theta=47.5, mech=1 + 4)
    rl_b = get_mw(lparms, rparms, parms_scalar)
    np.testing.assert_allclose(rl_a[5], rl_b[5], rtol=1e-6)


def test_dem_ddm_inputs_rejected():
    """DEM/DDM transfer modes are unimplemented; real inputs must error,
    not be silently dropped (the binary's ABI carries T/DEM/DDM arrays —
    the reference only ever passes dummy scalars,
    synthetic_FF_map_single_thread.py:203-208)."""
    from raytracinggrff_tpu.grff.native import get_mw_native
    nz, nf = 6, 2
    parms = _pack(np.full(nz, 1e9), np.full(nz, 1e6), np.full(nz, 1e8),
                  np.full(nz, 1.0))
    rparms = np.array([AREA, 100e6, 0.1])
    lp_ok = np.array([nz, nf, 0, 0, 0], np.int32)

    # non-scalar DEM array -> python paths raise
    dem = np.ones((5, nz))
    with pytest.raises(NotImplementedError, match="DEM"):
        get_mw(lp_ok, rparms, parms, dem=dem)
    # nonzero scalar T node also counts as non-dummy
    with pytest.raises(NotImplementedError, match="T"):
        get_mw(lp_ok, rparms, parms, t=np.array(1e6))

    # Lparms[2] = NT > 0 -> DEM mode requested; both paths reject
    lp_dem = np.array([nz, nf, 5, 1, 0], np.int32)
    with pytest.raises(NotImplementedError, match="Lparms"):
        get_mw(lp_dem, rparms, parms)
    with pytest.raises(NotImplementedError, match="status 2"):
        get_mw_native(lp_dem, rparms, parms)

    # the dummy-scalar convention still works on every path
    rl = get_mw(lp_ok, rparms, parms, t=np.array(0.0), dem=np.array(0.0),
                ddm=np.array(0.0))
    rl_n = get_mw_native(lp_ok, rparms, parms, t=0.0, dem=0.0, ddm=0.0)
    assert np.all(rl[5] > 0) and np.all(rl_n[5] > 0)


def test_get_mw_rejects_mixed_mechanism():
    nz, nf = 6, 1
    parms = _pack(np.full(nz, 1e9), np.full(nz, 1e6), np.full(nz, 1e8),
                  np.full(nz, 1.0))
    parms[6, 3:] = 1
    lparms = np.array([nz, nf, 0, 0, 0], np.int32)
    rparms = np.array([AREA, 100e6, 0.0])
    with pytest.raises(ValueError, match="mechanism"):
        get_mw(lparms, rparms, parms)
