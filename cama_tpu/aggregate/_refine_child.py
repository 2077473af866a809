"""CPU-pinned subprocess entrypoint for site refinement.

Used by Site.refine_alignment when the parent process's jax backend registry
is blocked (the tunneled accelerator client's first connection holds jax's
global backend lock — minutes in slow service phases — so even
`jax.local_devices('cpu')` cannot return there).  This child pins the
platform to CPU BEFORE any backend initializes (jax.config pre-init is the
one override the baked accelerator sitecustomize honors), runs the SAME
optimization core, and hands the deltas back via npz.

    python -m cama_tpu.aggregate._refine_child in.npz out.npz
"""
import sys


def main(in_path, out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any backend init
    import numpy as np

    from cama_tpu.aggregate.site import _optimize_pair_deltas

    d = np.load(in_path)
    deltas, before, after, center = _optimize_pair_deltas(
        d["pts"], d["w"], d["ii_p"], d["jj_p"], d["pair_mask"], d["clip"],
        int(d["n_clips"]), int(d["n_pairs"]), int(d["iters"]),
        float(d["lr"]))
    out = {"before": before, "after": after, "center": center,
           "has_deltas": deltas is not None}
    if deltas is not None:
        out.update(rot=deltas[0], t=deltas[1], log_s=deltas[2])
    np.savez(out_path, **out)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
