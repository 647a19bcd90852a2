"""Training-equivalence + wall-time artifact for the Sinkhorn EMD mode.

Runs the SAME synthetic training twice on the real chip — the default
auction EMD (strict reference semantics, loss/loss.py:23) vs ``--emd_impl
sinkhorn`` (annealed entropic OT, losses/sinkhorn.py) — from the same init
(fixed seed) on identical data order at the reference's production
settings (batch 128, 1024 points, Adam). Records per-step losses, final
CD/EMD, and the wall-time ratio to ``docs/sinkhorn_equiv.json`` — the
at-scale counterpart of tests/test_train_parity.py::
test_sinkhorn_training_mode_tracks_auction and the quality evidence behind
bench.py's ``sinkhorn_images_per_sec`` headline scalar.

Note the reported losses: the emd_loss column is computed by each arm's
own EMD implementation, so cross-arm loss values are comparable only
through the shared chamfer_loss column plus the final CROSS-EVAL row —
after training, BOTH final models are scored with the strict auction
EMD + CD on a held-out batch, which is the apples-to-apples quality bar.

Usage: ``python tools/sinkhorn_equiv.py [--steps 24] [--batch 128]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from equiv_common import make_batches, train_arm, wall_sans_compile  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps_per_epoch", type=int, default=8)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "sinkhorn_equiv.json"))
    opt = parser.parse_args(argv)

    from fenet.utils.compilation_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from fenet.losses.facade import chamfer_loss, emd_loss
    from fenet.train.config import TrainConfig

    batches, held_out = make_batches(opt.steps, opt.batch)

    def arm(emd_impl):
        cfg = TrainConfig(batch_size=opt.batch, emd_impl=emd_impl)
        hist, walls, state, trainer = train_arm(
            cfg, batches, opt.steps_per_epoch, emd_impl
        )

        # Cross-eval: strict auction EMD + CD on a held-out batch.
        model = trainer.model

        @jax.jit
        def score(params, batch_stats, img, pts):
            (_, _, pc3), _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                img.astype(jnp.float32), train=True,
                mutable=["batch_stats"],
            )
            return (chamfer_loss(pc3, pts), emd_loss(pc3, pts, 0.05, 3000))

        h_img, h_pts = held_out
        cd, emd = score(state.params, state.batch_stats,
                        jnp.asarray(h_img), jnp.asarray(h_pts))
        cross = {"chamfer": float(cd), "auction_emd": float(emd)}
        print(json.dumps({"arm": emd_impl, "cross_eval": cross}),
              flush=True)
        return hist, walls, cross

    a_hist, a_w, a_cross = arm("auction")
    s_hist, s_w, s_cross = arm("sinkhorn")

    a_wall, s_wall = wall_sans_compile(a_w), wall_sans_compile(s_w)
    record = {
        "settings": {
            "batch": opt.batch, "steps": opt.steps,
            "steps_per_epoch": opt.steps_per_epoch,
            "auction": "eps=0.05 iters=3000 (loss/loss.py:23)",
            "sinkhorn": "blur=0.01 x 300 annealed iters "
                        "(losses/sinkhorn.py defaults)",
            "seed": 0, "identical_data_order": True,
        },
        "auction": {"final": a_hist[-1], "cross_eval": a_cross,
                    "wall_seconds_sans_compile": round(a_wall, 2),
                    "per_step": a_hist},
        "sinkhorn": {"final": s_hist[-1], "cross_eval": s_cross,
                     "wall_seconds_sans_compile": round(s_wall, 2),
                     "per_step": s_hist},
        "cross_eval_rel_diff": {
            k: round(abs(a_cross[k] - s_cross[k]) / max(abs(a_cross[k]),
                                                        1e-9), 5)
            for k in a_cross
        },
        "speedup_auction_over_sinkhorn_wall_ratio": round(
            a_wall / s_wall, 3
        ),
    }
    with open(opt.out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps({"out": opt.out,
                      "speedup": record[
                          "speedup_auction_over_sinkhorn_wall_ratio"],
                      "cross_eval_rel_diff": record["cross_eval_rel_diff"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
