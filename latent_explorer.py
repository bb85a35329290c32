#!/usr/bin/env python3
"""Latent-space shape explorer — equivalent of the reference's
interactive_visualization_latent_to_shape.ipynb.

Modes:
- ``interp`` / ``sweep``: batch figure (latent interpolation / single-dim
  sweep rendered to a PNG strip)
- ``html``: **interactive** — exports a self-contained HTML explorer with
  one slider per latent dim over precomputed marching-cubes frames
  (drag-rotate canvas viewer; no network or dependencies):

      python latent_explorer.py -e <exp> --mode html --dims 0 1 2 3

- ``live``: matplotlib-widget sliders decoding through the real decoder on
  every change (notebook parity; requires a display)
"""

import argparse
import os

import msd_tpu.workspace as ws
from msd_tpu import plotting
from msd_tpu.models import build_decoder
from msd_tpu.utils import add_common_args, configure_logging
from msd_tpu.utils import checkpoint as ckpt
from msd_tpu.utils.compile_cache import enable_compile_cache


def main():
    parser = argparse.ArgumentParser(description="Explore the latent space of a trained decoder")
    parser.add_argument("--experiment", "-e", required=True)
    parser.add_argument("--checkpoint", "-c", default="latest")
    parser.add_argument("--mode", choices=["interp", "sweep", "html", "live"], default="interp")
    parser.add_argument("--shape_a", type=int, default=0)
    parser.add_argument("--shape_b", type=int, default=1)
    parser.add_argument("--dim", type=int, default=0, help="latent dim for sweep mode")
    parser.add_argument("--dims", type=int, nargs="*", default=None,
                        help="latent dims to expose as sliders (html/live modes)")
    parser.add_argument("--delta", type=float, default=0.05, help="sweep range +-delta")
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--resolution", "-N", type=int, default=129)
    parser.add_argument("--out", default=None)
    add_common_args(parser)
    args = parser.parse_args()
    configure_logging(args)
    enable_compile_cache()

    specs = ws.load_experiment_specifications(args.experiment)
    decoder = build_decoder(specs["NetworkArch"], specs["CodeLength"], specs["NetworkSpecs"])
    params, epoch = ckpt.load_model(args.experiment, args.checkpoint, decoder)
    latents, _ = ckpt.load_latent_vectors(args.experiment, args.checkpoint + ".pth")

    if args.mode in ("html", "live"):
        from msd_tpu import explorer

        base = latents[args.shape_a]
        if args.mode == "html":
            out = args.out or os.path.join(
                args.experiment, f"latent_explorer_epoch{epoch}.html"
            )
            steps = args.steps if args.steps > 1 else 9
            explorer.export_interactive_html(
                decoder, params, base, out, dims=args.dims, steps=steps,
                delta=args.delta, N=min(args.resolution, 97),
                title=f"{os.path.basename(os.path.normpath(args.experiment))} "
                      f"epoch {epoch} latent explorer",
            )
            print(f"saved {out} — open in any browser")
        else:
            explorer.run_matplotlib_explorer(
                decoder, params, base, dims=args.dims,
                delta=args.delta, N=min(args.resolution, 64),
            )
        return

    if args.mode == "interp":
        lat_a, lat_b = latents[args.shape_a], latents[args.shape_b]
        title = f"interp_{args.shape_a}_{args.shape_b}"
    else:
        lat_a = latents[args.shape_a].copy()
        lat_b = lat_a.copy()
        lat_a[args.dim] -= args.delta
        lat_b[args.dim] += args.delta
        title = f"sweep_shape{args.shape_a}_dim{args.dim}"

    fig = plotting.plot_lat_interpolation(
        decoder, params, lat_a, lat_b, steps=args.steps, N=args.resolution
    )
    out = args.out or os.path.join(args.experiment, f"latent_{title}_epoch{epoch}.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
