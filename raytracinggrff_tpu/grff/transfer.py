"""Two-mode radiative transfer along lines of sight (native GRFF equivalent).

Replaces the per-pixel ctypes calls into GRFF_DEM_Transfer.so
(script/resample_with_ray_tracing.py:467-524) and the fastGRFF batched GPU
path (:400-466) with one jitted lax.scan over voxels, broadcast over
(pixel, frequency). No FFI, no host loop: trace -> sample -> transfer can fuse
into a single XLA graph.

Contract mirrored from the reference usage:
  * voxel arrays are step-major (Nz, n_pix) exactly as produced by the LOS
    sampler; voxel 0 is the far end of the integration, emergent intensity is
    taken after the last voxel (GRFF LOS ordering; the straight-LOS pipeline
    packs the deepest point first, script/resampling_MAS_LOS.py:222-233).
  * invalid voxels (valid_mask False, non-finite fields, or ds == 0)
    contribute nothing, matching the reference's compaction of valid voxels
    (script/resample_with_ray_tracing.py:470-501) — skipping a voxel and
    compacting are equivalent for the transfer recurrence.
  * per-voxel source area: s_area_cm2 > 0 overrides pixel_area_cm2
    (Parms[14] contract, script/resample_with_ray_tracing.py:501).
  * frequencies: f_i = f0 * 10^(i*dlog) (Rparms contract, :355-366).
  * outputs: fluxes of the two magnetoionic modes in SFU; reference scripts
    consume RL[5]+RL[6] = I and (RL[5]-RL[6])/I = V/I (:513-516). Here
    flux_o plays RL[5] and flux_x plays RL[6].

Radiative transfer per mode sigma: in terms of the refraction invariant
J = I/n_sigma^2 the source term is n-independent (S_J = k_B T nu^2 / c^2 per
mode), so each voxel applies

    J <- J * exp(-tau) + (k_B T nu^2 / c^2) * (1 - exp(-tau)),

the emergent vacuum intensity equals J, and evanescent voxels
(n_sigma^2 <= 0) block the mode entirely (J <- 0).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AU_CM, C_CGS, KB_CGS, SFU2CGS
from .physics import (O_MODE, X_MODE, freefree_kappa, gyroresonance_kappa,
                      neutral_hydrogen_kappa)

MECH_FREEFREE = 1
MECH_GYRORESONANCE = 2
MECH_NEUTRALS = 4


class GrffResult(NamedTuple):
    freqs_ghz: jax.Array   # (Nf,)
    flux_o: jax.Array      # (n_pix, Nf) SFU — RL[5] slot
    flux_x: jax.Array      # (n_pix, Nf) SFU — RL[6] slot
    tau_o: jax.Array       # (n_pix, Nf) total optical depth (diagnostic)
    tau_x: jax.Array


def log_spaced_freqs(freq0_hz, nfreq, freq_log_step, xp=np):
    return freq0_hz * (10.0 ** (freq_log_step * xp.arange(nfreq)))


def make_voxel_update(freqs, pixel_area_cm2, theta_deg=90.0,
                      mechanism=MECH_FREEFREE | MECH_NEUTRALS, s_max=30,
                      gaunt="dulk"):
    """Build the per-voxel transfer update used by both the batch scan
    (grff_transfer) and the streaming pipeline (one segment at a time).

    Returned fn: (carry, ds_k, te_k, ne_k, b_k, mask_k, sarea_k[, theta_k]
    [, mech_k]) -> carry with carry = (flux_o, flux_x, tau_o, tau_x), each
    (n_pix, Nf). theta_k (radians, per-pixel) overrides the closure angle —
    the real GET_MW ABI permits per-voxel theta in Parms[4]. mech_k
    (int32, per-pixel) overrides the closure mechanism flags per voxel —
    Parms[6] may likewise vary along the LOS (a chromosphere+corona LOS
    with different mechanism sets per segment); when used, the static
    `mechanism` argument must be the bitwise UNION of all per-voxel values
    (it decides which coefficient computations are compiled in; mech_k
    masks them per voxel). Semantics match the C++ shim
    (native/grff_transfer.cpp): the neutral term (bit 4) contributes only
    where free-free (bit 1) is also on.

    Handedness: theta is the angle between B and the wave vector, theta > 90
    deg meaning B points against the propagation direction. The magnetoionic
    opacities are symmetric under theta -> 180 - theta (they depend on
    cos^2 and |cos|), but the OBSERVED circular handedness of the sigma = +1
    mode flips with sign(B.k), so for cos(theta) < 0 the two output slots
    swap per voxel. With the reference's fixed theta = 90 this is inert
    (cos = 0), preserving exact parity with the Parms[4] = 90 contract
    (resample_with_ray_tracing.py:489-501); with per-voxel theta it makes
    flux_o - flux_x a signed Stokes-V proxy that reverses across a magnetic
    polarity inversion line."""
    freqs = jnp.asarray(freqs, jnp.float32)
    theta0 = jnp.float32(np.deg2rad(theta_deg))
    include_ff = bool(mechanism & MECH_FREEFREE)
    include_neutrals = bool(mechanism & MECH_NEUTRALS)
    include_gr = bool(mechanism & MECH_GYRORESONANCE)
    area_default = jnp.float32(pixel_area_cm2)
    src_coef = (jnp.float32(KB_CGS / (C_CGS * C_CGS) / SFU2CGS)
                * (freqs * freqs))
    inv_au_sq = jnp.float32(1.0 / AU_CM) * jnp.float32(1.0 / AU_CM)

    def update(carry, ds_k, te_k, ne_k, b_k, mask_k, sarea_k, theta_k=None,
               mech_k=None):
        f_o, f_x, t_o, t_x = carry
        theta = theta0 if theta_k is None else theta_k[:, None]
        mask = (mask_k & jnp.isfinite(ne_k) & jnp.isfinite(te_k)
                & jnp.isfinite(b_k) & jnp.isfinite(ds_k) & (ds_k > 0))
        ne_s = jnp.where(mask, ne_k, 1.0)[:, None]
        te_s = jnp.where(mask, te_k, 1e6)[:, None]
        b_s = jnp.where(mask, b_k, 0.0)[:, None]
        ds_s = jnp.where(mask, ds_k, 0.0)[:, None]
        m = mask[:, None]
        area = (jnp.where(sarea_k > 0, sarea_k, area_default)
                * inv_au_sq)[:, None]
        nu = freqs[None, :]

        def coeffs(sigma):
            if mech_k is None:
                kappa, n2 = freefree_kappa(
                    ne_s, te_s, b_s, nu, theta, sigma,
                    include_neutrals=include_neutrals, xp=jnp, gaunt=gaunt)
                if not include_ff:
                    kappa = jnp.zeros_like(kappa)
                if include_gr:
                    kappa = kappa + gyroresonance_kappa(
                        ne_s, te_s, b_s, nu, theta, sigma, s_max=s_max,
                        xp=jnp)
            else:
                # per-voxel mechanism gating: include_* say which terms are
                # compiled at all (union of bits); mech_k masks per voxel
                kappa_ff, n2 = freefree_kappa(
                    ne_s, te_s, b_s, nu, theta, sigma,
                    include_neutrals=False, xp=jnp, gaunt=gaunt)
                ff_on = ((mech_k & MECH_FREEFREE) != 0)[:, None]
                kappa = jnp.where(ff_on & include_ff, kappa_ff, 0.0)
                if include_ff and include_neutrals:
                    n_on = ff_on & (((mech_k & MECH_NEUTRALS) != 0)[:, None])
                    kappa = kappa + jnp.where(
                        n_on, neutral_hydrogen_kappa(
                            ne_s, te_s, b_s, nu, theta, sigma, xp=jnp), 0.0)
                if include_gr:
                    gr_on = ((mech_k & MECH_GYRORESONANCE) != 0)[:, None]
                    kappa = kappa + jnp.where(
                        gr_on, gyroresonance_kappa(
                            ne_s, te_s, b_s, nu, theta, sigma, s_max=s_max,
                            xp=jnp), 0.0)
            tau = jnp.where(m, kappa * ds_s, 0.0)
            tau = jnp.where(jnp.isfinite(tau), tau, 0.0)
            evan = m & (n2 <= 0.0)
            return tau, evan

        tau_p, evan_p = coeffs(O_MODE)
        tau_m, evan_m = coeffs(X_MODE)
        if theta_k is None:
            tau_os, evan_os, tau_xs, evan_xs = tau_p, evan_p, tau_m, evan_m
        else:
            # B against k: handedness flips. The dead zone absorbs the
            # float32 arccos/cos round-trip at exactly perpendicular B
            # (cos(arccos(0f)) ~ -4e-8), where handedness is physically
            # undefined anyway.
            swap = jnp.cos(theta) < -1e-6
            tau_os = jnp.where(swap, tau_m, tau_p)
            evan_os = jnp.where(swap, evan_m, evan_p)
            tau_xs = jnp.where(swap, tau_p, tau_m)
            evan_xs = jnp.where(swap, evan_p, evan_m)

        def apply(f, t_sum, tau, evan):
            att = jnp.exp(-tau)
            emit = -jnp.expm1(-tau)
            src = te_s * src_coef[None, :] * area
            f_new = f * att + jnp.where(m, src * emit, 0.0)
            f_new = jnp.where(evan, 0.0, f_new)
            t_new = jnp.where(evan, jnp.inf, t_sum + tau)
            return f_new, t_new

        f_o, t_o = apply(f_o, t_o, tau_os, evan_os)
        f_x, t_x = apply(f_x, t_x, tau_xs, evan_xs)
        return (f_o, f_x, t_o, t_x)

    return update


def transfer_carry_init(n_pix, nf):
    z = jnp.zeros((n_pix, nf), jnp.float32)
    return (z, z, z, z)


def grff_transfer(
    ds,                    # (Nz, n_pix) segment lengths, cm
    te,                    # (Nz, n_pix) K
    ne,                    # (Nz, n_pix) cm^-3
    b,                     # (Nz, n_pix) G
    valid,                 # (Nz, n_pix) bool
    freqs_hz,              # (Nf,)
    pixel_area_cm2,
    s_area_cm2=None,       # (Nz, n_pix) per-voxel source area or None
    theta_deg=90.0,        # scalar, (Nz,), or (Nz, n_pix) degrees
    mechanism: int = MECH_FREEFREE | MECH_NEUTRALS,
    s_max: int = 30,       # max gyro harmonic (Parms[7] contract)
    gaunt: str = "dulk",   # free-free Gaunt: 'dulk' (ref parity) | 'exact'
) -> GrffResult:
    theta_arr = None
    if np.ndim(theta_deg) > 0:
        # per-voxel theta (the real GET_MW ABI allows Parms[4] to vary);
        # jnp keeps device arrays on device (the ray pipeline passes a
        # (n_records, n_rays) theta block computed from the traced B.k)
        theta_arr = jnp.deg2rad(jnp.broadcast_to(
            jnp.asarray(theta_deg, jnp.float32).reshape(
                (-1, 1) if np.ndim(theta_deg) == 1 else np.shape(theta_deg)),
            np.shape(ds))).astype(jnp.float32)
        theta_deg = -1.0   # unused; keeps the jit cache key stable
    mech_arr = None
    if np.ndim(mechanism) > 0:
        # per-voxel mechanism flags (Parms[6] may vary along the LOS).
        # Must be a host array: the bit UNION becomes the static mechanism
        # (it decides which coefficient terms get compiled; the per-voxel
        # array masks them at run time)
        m = np.asarray(mechanism, np.int32)
        mech_arr = jnp.broadcast_to(
            jnp.asarray(m).reshape((-1, 1) if m.ndim == 1 else m.shape),
            np.shape(ds)).astype(jnp.int32)
        mechanism = int(np.bitwise_or.reduce(m.reshape(-1))) if m.size else 0
    return _grff_transfer_jit(ds, te, ne, b, valid, freqs_hz,
                              pixel_area_cm2, s_area_cm2, theta_arr,
                              mech_arr, float(theta_deg), int(mechanism),
                              int(s_max), str(gaunt))


@functools.partial(jax.jit,
                   static_argnames=("mechanism", "theta_deg", "s_max",
                                    "gaunt"))
def _grff_transfer_jit(ds, te, ne, b, valid, freqs_hz, pixel_area_cm2,
                       s_area_cm2, theta_rad, mech_arr, theta_deg, mechanism,
                       s_max, gaunt="dulk"):
    ds = jnp.asarray(ds, jnp.float32)
    te = jnp.asarray(te, jnp.float32)
    ne = jnp.asarray(ne, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    valid = jnp.asarray(valid, bool)
    freqs = jnp.asarray(freqs_hz, jnp.float32)

    n_pix = ds.shape[1]
    nf = freqs.shape[0]
    if s_area_cm2 is None:
        s_area_cm2 = jnp.zeros_like(ds)
    else:
        s_area_cm2 = jnp.asarray(s_area_cm2, jnp.float32)

    update = make_voxel_update(freqs, pixel_area_cm2, theta_deg,
                               mechanism, s_max, gaunt)

    def voxel_step(carry, xs):
        ds_k, te_k, ne_k, b_k, valid_k, sarea_k = xs[:6]
        i = 6
        theta_k = None
        if theta_rad is not None:
            theta_k = xs[i]
            i += 1
        mech_k = xs[i] if mech_arr is not None else None
        return update(carry, ds_k, te_k, ne_k, b_k, valid_k, sarea_k,
                      theta_k, mech_k), None

    xs = (ds, te, ne, b, valid, s_area_cm2)
    if theta_rad is not None:
        xs = xs + (jnp.asarray(theta_rad),)
    if mech_arr is not None:
        xs = xs + (jnp.asarray(mech_arr),)
    (f_o, f_x, t_o, t_x), _ = jax.lax.scan(
        voxel_step, transfer_carry_init(n_pix, nf), xs)

    return GrffResult(freqs_ghz=freqs / 1e9, flux_o=f_o, flux_x=f_x,
                      tau_o=t_o, tau_x=t_x)


def tb_from_sfu(flux_sfu, freq_hz, pixel_area_cm2):
    """SFU flux -> Rayleigh-Jeans brightness temperature, K.

    T_b = F * 1e-19 * c^2 / (2 k_B nu^2) / pixel_area * AU^2
    (ref: script/resample_with_ray_tracing.py:95-97, 513-519).
    """
    conv = (SFU2CGS * C_CGS * C_CGS
            / (2.0 * KB_CGS * freq_hz * freq_hz)
            / pixel_area_cm2) * (AU_CM * AU_CM)
    return flux_sfu * conv


def _is_dummy(arr):
    """The reference's dummy-scalar convention: None, or a <=1-element
    zero array (script/synthetic_FF_map_single_thread.py:203-208)."""
    if arr is None:
        return True
    arr = np.asarray(arr, np.float64)
    return arr.size <= 1 and (arr.size == 0
                              or float(arr.reshape(-1)[0]) == 0.0)


def _classify_dem_inputs(lparms, nz, t, dem, ddm):
    """Validate the DEM/DDM portion of the GET_MW ABI.

    Returns (t_grid, dem_arr) — both float64, shapes (NT,) and (NT, Nz) —
    when DEM mode is active (Lparms[2] = NT > 0 with a real T/DEM pair),
    else None. DDM mode (Lparms[4] != 0 or a non-dummy DDM array) stays
    NotImplementedError: the reference pipelines never use it and the
    density-matrix moments are out of scope (VERDICT r4 #6 keeps DDM
    rejected). Inconsistent half-dummy input is an error, not a silent
    fallback.
    """
    lparms = np.asarray(lparms)
    nt = int(lparms[2]) if lparms.size > 2 else 0
    if (lparms.size > 4 and lparms[4] != 0) or not _is_dummy(ddm):
        raise NotImplementedError(
            "DDM transfer mode (Lparms[4] != 0 / non-dummy DDM array) is "
            "not implemented; DEM mode (Lparms[2] = NT with a T/DEM pair) "
            "is supported")
    if nt <= 0:
        if not (_is_dummy(t) and _is_dummy(dem)):
            raise ValueError(
                "non-dummy T/DEM arrays passed with Lparms[2] = 0; set "
                "Lparms[2] = NT to enable the DEM transfer mode")
        return None
    if nt == 1:
        raise ValueError("DEM mode needs NT >= 2 temperature nodes")
    if _is_dummy(t) or _is_dummy(dem):
        raise ValueError(
            f"DEM mode requested (Lparms[2] = {nt}) but T/DEM are the "
            "dummy scalars; pass a real (NT,) T grid and (NT, Nz) DEM")
    t_grid = np.asarray(t, np.float64).reshape(-1)
    if t_grid.size != nt:
        raise ValueError(f"T grid has {t_grid.size} nodes, Lparms[2]={nt}")
    if np.any(np.diff(t_grid) <= 0) or np.any(t_grid <= 0):
        raise ValueError("T grid must be positive and strictly ascending")
    dem_arr = np.asarray(dem, np.float64)
    if dem_arr.size == nt * nz:
        dem_arr = dem_arr.reshape(nt, nz, order="F")  # column-major ABI
    else:
        raise ValueError(
            f"DEM must have NT*Nz = {nt * nz} entries (column-major "
            f"(NT, Nz) like Parms), got {dem_arr.size}")
    return t_grid, dem_arr


@functools.partial(jax.jit,
                   static_argnames=("mechanism", "s_max", "gaunt"))
def _grff_transfer_dem_jit(ds, te, ne, b, theta_rad, sarea, mech, t_grid,
                           dem, freqs, pixel_area_cm2, mechanism, s_max,
                           gaunt="dulk"):
    """Single-LOS two-mode transfer with DEM(T) free-free (see
    physics.dem_freefree_moments for the kernel-moment derivation).

    Shapes: ds/te/ne/b/theta_rad/sarea/mech (Nz,), t_grid (NT,),
    dem (NT, Nz), freqs (Nf,). `mechanism` (static) is the bit UNION of
    the per-voxel `mech` flags (compile gating; `mech` masks per voxel). The magnetoionic factors (n_sigma, eff_nu, evanescence)
    use the thermal n_e of Parms[2] — the DEM controls emission and
    absorption, the cold-plasma dispersion still needs a density. Neutral
    (bit 4, needs bit 1) and gyroresonance (bit 2) terms, when enabled,
    use the single-temperature Parms values and contribute kappa*ds; the
    voxel source temperature is the opacity-weighted mix of T_eff(nu) and
    T_e. Returns (flux_o, flux_x, tau_o, tau_x), each (Nf,).
    """
    from .physics import (KAPPA_FF_COEF, KAPPA_FF_EXACT_COEF,
                          dem_freefree_moments, refractive_index_sq)
    from ..constants import FB_COEF, FPE_COEF

    ds = jnp.asarray(ds, jnp.float32)
    te = jnp.asarray(te, jnp.float32)
    ne = jnp.asarray(ne, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    theta = jnp.asarray(theta_rad, jnp.float32)[:, None]
    freqs = jnp.asarray(freqs, jnp.float32)
    nu = freqs[None, :]

    include_ff = bool(mechanism & MECH_FREEFREE)
    include_neutrals = bool(mechanism & MECH_NEUTRALS)
    include_gr = bool(mechanism & MECH_GYRORESONANCE)

    valid = (jnp.isfinite(ds) & (ds > 0) & jnp.isfinite(ne)
             & jnp.isfinite(te) & jnp.isfinite(b))
    ne_s = jnp.where(valid, ne, 1.0)[:, None]
    te_s = jnp.where(valid, te, 1e6)[:, None]
    b_s = jnp.where(valid, b, 0.0)[:, None]
    ds_s = jnp.where(valid, ds, 0.0)[:, None]
    m = valid[:, None]

    m_k, t_eff = dem_freefree_moments(t_grid, dem, freqs, xp=jnp,
                                      gaunt=gaunt)
    coef = KAPPA_FF_EXACT_COEF if gaunt == "exact" else KAPPA_FF_COEF

    nu_p_sq = (FPE_COEF ** 2) * ne_s
    nu_b = FB_COEF * b_s
    X = nu_p_sq / (nu * nu)
    Y = nu_b / nu

    area = (jnp.where(sarea > 0, jnp.asarray(sarea, jnp.float32),
                      jnp.float32(pixel_area_cm2))[:, None]
            * jnp.float32(1.0 / AU_CM) * jnp.float32(1.0 / AU_CM))
    src_coef = (jnp.float32(KB_CGS / (C_CGS * C_CGS) / SFU2CGS)
                * (freqs * freqs))[None, :]

    mech = jnp.asarray(mech, jnp.int32)
    ff_on = ((mech & MECH_FREEFREE) != 0)[:, None]
    n_on = ff_on & (((mech & MECH_NEUTRALS) != 0)[:, None])
    gr_on = ((mech & MECH_GYRORESONANCE) != 0)[:, None]

    def mode(sigma):
        n2 = refractive_index_sq(X, Y, theta, sigma, xp=jnp)
        n_sig = jnp.sqrt(jnp.maximum(n2, 1e-12))
        eff = nu + sigma * nu_b * jnp.abs(jnp.cos(theta))
        eff2 = jnp.maximum(eff * eff, 1e-30)
        tau_ff = jnp.where(ff_on, coef * m_k / (n_sig * eff2), 0.0) \
            if include_ff else jnp.zeros_like(m_k)
        tau_th = jnp.zeros_like(m_k)
        if include_ff and include_neutrals:
            tau_th = tau_th + jnp.where(n_on, neutral_hydrogen_kappa(
                ne_s, te_s, b_s, nu, theta, sigma, xp=jnp) * ds_s, 0.0)
        if include_gr:
            tau_th = tau_th + jnp.where(gr_on, gyroresonance_kappa(
                ne_s, te_s, b_s, nu, theta, sigma, s_max=s_max,
                xp=jnp) * ds_s, 0.0)
        tau = jnp.where(m, tau_ff + tau_th, 0.0)
        tau = jnp.where(jnp.isfinite(tau), tau, 0.0)
        src_t = ((tau_ff * t_eff + tau_th * te_s)
                 / jnp.maximum(tau_ff + tau_th, 1e-30))
        evan = m & (n2 <= 0.0)

        def voxel(carry, xs):
            f, t_sum = carry
            tau_k, evan_k, src_k, m_row = xs
            att = jnp.exp(-tau_k)
            emit = -jnp.expm1(-tau_k)
            f = f * att + jnp.where(m_row, src_k * emit, 0.0)
            f = jnp.where(evan_k, 0.0, f)
            t_sum = jnp.where(evan_k, jnp.inf, t_sum + tau_k)
            return (f, t_sum), None

        src = src_t * src_coef * area
        nf = freqs.shape[0]
        (f, t_sum), _ = jax.lax.scan(
            voxel, (jnp.zeros(nf, jnp.float32), jnp.zeros(nf, jnp.float32)),
            (tau, evan, src, jnp.broadcast_to(m, tau.shape)))
        return f, t_sum

    f_o, t_o = mode(O_MODE)
    f_x, t_x = mode(X_MODE)
    return f_o, f_x, t_o, t_x


def get_mw(lparms, rparms, parms, t=None, dem=None, ddm=None):
    """Single-LOS GET_MW-compatible entry (ref ctypes contract:
    script/synthetic_FF_map_single_thread.py:27-35, 189-208).

    lparms: [Nz, Nf, NT, key_DEM, key_DDM] int; rparms:
    [area_cm2, f0_hz, dlogf]; parms: (15, Nz) float array with rows
      0: ds cm, 1: T K, 2: n_e cm^-3, 3: |B| G, 4: theta deg,
      6: mechanism flags, 7: max harmonic, 14: per-voxel source area cm^2.

    DEM mode (Lparms[2] = NT >= 2 with a real T/DEM pair): t is the (NT,)
    temperature grid in K (ascending) and dem the column-major (NT, Nz)
    differential emission measure per voxel [cm^-5 K^-1, the voxel path
    length folded into the column]; the free-free term integrates over the
    DEM (physics.dem_freefree_moments) while dispersion/evanescence still
    use Parms[2] n_e and neutral/gyro terms (if flagged) the Parms[1] T.
    The reference's dummy-scalar convention (NT = 0, scalar-0 T/DEM/DDM)
    selects the uniform-T path. DDM mode raises NotImplementedError.

    Returns RL (7, Nf): RL[0]=f GHz, RL[5]=O-mode SFU, RL[6]=X-mode SFU,
    RL[1]/RL[2] = total optical depths of the two modes.
    """
    parms = np.asarray(parms, np.float64)
    nz = int(lparms[0])
    nf = int(lparms[1])
    dem_inputs = _classify_dem_inputs(lparms, nz, t, dem, ddm)
    freqs = log_spaced_freqs(float(rparms[1]), nf, float(rparms[2]))
    if dem_inputs is not None:
        t_grid, dem_arr = dem_inputs
        mech_col = parms[6, :nz].astype(np.int32)
        mech_union = int(np.bitwise_or.reduce(mech_col)) if nz else 1
        s_max = int(parms[7, 0]) if nz and parms[7, 0] > 0 else 30
        f_o, f_x, t_o, t_x = _grff_transfer_dem_jit(
            parms[0, :nz], parms[1, :nz], parms[2, :nz], parms[3, :nz],
            np.deg2rad(parms[4, :nz]), parms[14, :nz], mech_col,
            t_grid, dem_arr, freqs, float(rparms[0]), mech_union, s_max)
        rl = np.zeros((7, nf))
        rl[0] = freqs / 1e9
        rl[1] = np.asarray(t_o)
        rl[2] = np.asarray(t_x)
        rl[5] = np.asarray(f_o)
        rl[6] = np.asarray(f_x)
        return rl
    # Parms[6] may vary per voxel (e.g. a mixed chromosphere/corona LOS
    # enabling different mechanism sets per segment), matching the real
    # GET_MW ABI and the C++ shim (native/grff_transfer.cpp reads mech per
    # column). Constant flags keep the scalar fast path / compiled variant.
    mech = parms[6, :nz].astype(np.int32) if nz else np.array([5], np.int32)
    mechanism = int(mech[0]) if np.ptp(mech) == 0 else mech
    theta = parms[4, :nz] if nz else 90.0
    if nz and np.ptp(theta) == 0.0:
        theta = float(theta[0])     # common case: one compiled variant
    res = grff_transfer(
        ds=parms[0, :nz, None], te=parms[1, :nz, None],
        ne=parms[2, :nz, None], b=parms[3, :nz, None],
        valid=np.ones((nz, 1), bool), freqs_hz=freqs,
        pixel_area_cm2=float(rparms[0]),
        s_area_cm2=parms[14, :nz, None],
        theta_deg=theta,
        mechanism=mechanism,
        s_max=int(parms[7, 0]) if nz and parms[7, 0] > 0 else 30,
    )
    rl = np.zeros((7, nf))
    rl[0] = np.asarray(res.freqs_ghz)
    rl[1] = np.asarray(res.tau_o[0])
    rl[2] = np.asarray(res.tau_x[0])
    rl[5] = np.asarray(res.flux_o[0])
    rl[6] = np.asarray(res.flux_x[0])
    return rl


def get_mw_slice(ds, te, ne, b, valid, freq0_hz, nfreq, freq_log_step,
                 pixel_area_cm2, s_area_cm2=None, theta_deg=90.0,
                 mechanism=MECH_FREEFREE | MECH_NEUTRALS, gaunt="dulk"):
    """Batched all-pixels transfer (fastGRFF get_mw_slice equivalent,
    ref: script/resample_with_ray_tracing.py:400-466) minus the GPU heap
    bookkeeping — arrays stay on device. theta_deg may be a scalar or a
    per-voxel (Nz,) / (Nz, n_pix) array (Parms[4] contract)."""
    freqs = log_spaced_freqs(float(freq0_hz), int(nfreq),
                             float(freq_log_step))
    if np.ndim(theta_deg) == 0:
        theta_deg = float(theta_deg)
    if np.ndim(mechanism) == 0:
        mechanism = int(mechanism)   # else per-voxel host array (Parms[6])
    return grff_transfer(ds, te, ne, b, valid, freqs, pixel_area_cm2,
                         s_area_cm2=s_area_cm2, theta_deg=theta_deg,
                         mechanism=mechanism, gaunt=gaunt)
