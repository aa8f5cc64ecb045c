"""Physical constants and unit conversions (CGS unless noted).

Single source of truth for values the reference duplicates per file
(ref: script/resample_with_ray_tracing.py:68-94, raytracingGRFF/build_rays.py:25-32,
script/synthetic_FF_map_single_thread.py:38-41).
"""

import numpy as np

# --- Solar / geometric ---
R_SUN_CM = 6.957e10          # solar radius, cm
R_SUN_M = 6.957e8            # solar radius, m
AU_CM = 1.49599e13           # astronomical unit, cm

# --- Fundamental (CGS) ---
C_CGS = 2.998e10             # speed of light, cm/s
KB_CGS = 1.38065e-16         # Boltzmann constant, erg/K
E_ESU = 4.8032e-10           # electron charge, esu
M_E_G = 9.1094e-28           # electron mass, g
H_ERG_S = 6.6261e-27         # Planck constant, erg s

# Light speed in units of R_sun per second — the ray ODE uses positions in
# R_sun and time in seconds (ref: build_rays.py:29-32 uses R_S = 6.96e10,
# subtly different from R_sun_cm; we keep the reference's value for parity).
R_S_REF_CM = 6.96e10
C_R = C_CGS / R_S_REF_CM     # ~0.43075 R_sun / s

# --- Radio / plasma ---
SFU2CGS = 1e-19              # 1 SFU = 1e-19 erg/s/cm^2/Hz
# Plasma frequency: f_pe [Hz] = FPE_COEF * sqrt(n_e [cm^-3])
# (ref: build_rays.py:357 uses 8.93e3 explicitly)
FPE_COEF = 8.93e3
# Electron gyrofrequency: f_B [Hz] = FB_COEF * B [G]
FB_COEF = 2.7992e6

# --- Grid / geometry guards (ref: build_rays.py:26-27, resampling_MAS_LOS.py:35) ---
R_MIN = 0.9999999            # minimum r (R_sun) for valid model interpolation
PHI0_OFFSET_DEFAULT = 0.0    # default longitude offset, deg (pipeline default;
                             # build_rays demo uses 24, TbSpectra uses -140)

# --- MAS normalization units (replaces psipy/astropy unit handling) ---
# MAS code units -> physical: values follow the PSI MAS normalization as
# exposed by psipy (ref usage: sample_at_coords(...).to(u.cm**-3 / u.K / u.G),
# script/resampling_MAS_LOS.py:254-263).
MAS_UNITS = {
    "rho": 1.0e8,            # -> cm^-3 (number density)
    "t": 2.807067e7,         # -> K
    "te": 2.807067e7,        # -> K
    "tp": 2.807067e7,        # -> K
    "br": 2.2068908,         # -> G
    "bt": 2.2068908,         # -> G
    "bp": 2.2068908,         # -> G
    "vr": 481.3711,          # -> km/s
    "vt": 481.3711,          # -> km/s
    "vp": 481.3711,          # -> km/s
    "p": 0.03875717,         # -> dyn/cm^2
    "jr": 2.267e4,           # -> statA/cm^2 (rarely used)
    "jt": 2.267e4,
    "jp": 2.267e4,
}

# --- LOS sampling fill values (ref: gpu_raytrace.py:724-726) ---
FILL_NE = 0.0
FILL_TE = 1e4
FILL_B = 0.0


def freq_to_omega(freq_hz):
    return 2.0 * np.pi * freq_hz


def ne_to_omega_pe(ne_cm3):
    """Plasma angular frequency [rad/s] from electron density [cm^-3]."""
    return FPE_COEF * np.sqrt(ne_cm3) * 2.0 * np.pi
