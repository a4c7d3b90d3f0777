"""Evaluate the LATEST checkpoint of a train_dir at explicit eval knobs —
the anchor-confirmation tool (round 5): the big-vocab convergence runs use
approx periodic eval (train.eval_recall_target=0.95) for cost, and this
re-measures the converged checkpoint with exact selection, on the full
sweep or an eval_max_batches subsample (a ~90 s exact-subsample confirm at
XING scale vs the ~16 min full exact sweep).

Usage:
    python tools/eval_ckpt.py --config configs/syn_xing_full.json \
        --set mesh.data=1 --set mesh.model=1 \
        --set train.train_dir=_train/anchor_xf_ce \
        --set train.eval_recall_target=1.0 --set train.eval_max_batches=200

Prints one JSON line: {"recall_at_k", "k", "step", "exact_selection",
"eval_rows_capped"}.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from arec.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main(argv=None) -> int:
    from arec.cli.main import load_config, parse_args
    from arec.train.loop import Trainer

    args = parse_args(argv)
    cfg = load_config(args)
    t = Trainer(cfg, serve_only=True)
    if t.ckpt.latest_step() is None:
        print(f"no checkpoint under {cfg.train.train_dir!r}",
              file=sys.stderr)
        return 1
    recall = t.evaluate()
    print(json.dumps({
        "recall_at_k": recall,
        "k": cfg.train.eval_topk,
        "step": int(t.state.step),
        "exact_selection": cfg.train.eval_recall_target >= 1.0,
        "eval_rows_capped": bool(cfg.train.eval_max_batches),
        "train_dir": cfg.train.train_dir,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
