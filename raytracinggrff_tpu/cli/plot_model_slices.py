"""Model z=0-plane slices of Ne/Te/|B| with on-disk sphere projection.

Capability of script/pub/plot_model_z0_slices.py (sample_plane :65-119):
samples the MAS model on the image z=0 plane; points with r < 1 are
projected onto the solar sphere surface facing the observer (the "disk"),
giving the characteristic disk + off-limb composite maps.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..constants import MAS_UNITS
from ..coords import image_xyz_to_mas_sph
from ..mas.model import MASModel


def sample_plane(model, n_pix=512, extent=2.0, phi0_offset=0.0):
    import jax.numpy as jnp

    xs = np.linspace(-extent, extent, n_pix)
    ys = np.linspace(-extent, extent, n_pix)
    X, Y = np.meshgrid(xs, ys)
    Z = np.zeros_like(X)
    rho2 = X ** 2 + Y ** 2
    # on-disk: project onto the sphere surface toward the observer (+z)
    on_disk = rho2 < 1.0
    Z = np.where(on_disk, np.sqrt(np.maximum(1.0 - rho2, 0.0)), 0.0)

    r, colat, lon = image_xyz_to_mas_sph(
        X.astype(np.float32), Y.astype(np.float32), Z.astype(np.float32),
        phi0_offset, xp=np)
    r = np.maximum(r, 1.0000001)

    out = {}
    temp_var = model.temperature_variable()
    rq = jnp.asarray(r, jnp.float32)
    cq = jnp.asarray(colat, jnp.float32)
    pq = jnp.asarray(lon, jnp.float32)
    out["ne"] = np.asarray(model["rho"].sample_sph(rq, cq, pq))
    out["te"] = np.asarray(model[temp_var].sample_sph(rq, cq, pq))
    b2 = sum(np.asarray(model[v].sample_sph(rq, cq, pq)) ** 2
             for v in ("br", "bt", "bp"))
    out["b"] = np.sqrt(b2)
    out["extent"] = [-extent, extent, -extent, extent]
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Plot z=0-plane Ne/Te/|B| slices of a MAS model.")
    p.add_argument("--model-path", "-m", default="./corona")
    p.add_argument("--n-pix", type=int, default=512)
    p.add_argument("--extent", type=float, default=2.0)
    p.add_argument("--phi0-offset", type=float, default=0.0)
    p.add_argument("--out", "-o", default="model_z0_slices.png")
    args = p.parse_args(argv)

    model = MASModel(args.model_path)
    data = sample_plane(model, args.n_pix, args.extent, args.phi0_offset)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    with np.errstate(divide="ignore", invalid="ignore"):
        panels = [(axes[0], np.log10(data["ne"]), "log N_e (cm$^{-3}$)",
                   "viridis"),
                  (axes[1], np.log10(data["te"]), "log T_e (K)", "plasma"),
                  (axes[2], np.log10(data["b"]), "log |B| (G)", "hot")]
    for ax, arr, label, cmap in panels:
        im = ax.imshow(arr, origin="lower", extent=data["extent"],
                       aspect="equal", cmap=cmap)
        ax.add_patch(plt.Circle((0, 0), 1.0, edgecolor="white",
                                facecolor="none", linewidth=1.0,
                                linestyle=":"))
        ax.set_xlabel("x (R_sun)")
        ax.set_ylabel("y (R_sun)")
        plt.colorbar(im, ax=ax, label=label)
    plt.tight_layout()
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"Saved {args.out}")
    return 0


if __name__ == "__main__":
    main()
