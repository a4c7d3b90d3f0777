"""CLI driver — the rebuild of `python hmf/run_mf.py --flag ...` /
`python lstm/run.py --flag ...` (SURVEY.md §2.1 driver rows, §5 config
system). One entry point for both model families:

    python -m arec.cli.main --config configs/c1_mf_id_ml1m.json
    python -m arec.cli.main --config ... --set train.batch_size=256 \
        --set mesh.model=4
    python -m arec.cli.main --config ... --recommend --out top30.tsv

Flags are dotted section.field overrides of the dataclass config
(arec/config.py); --recommend switches to the top-K emission mode
(SURVEY.md §3.3).

Mesh configs without a multi-chip slice: AREC_FAKE_DEVICES=8 forces the CPU
backend with 8 fake XLA devices (SURVEY.md §4 "Distributed tests without a
cluster"). A plain env var is NOT enough for that — a sitecustomize hook
pins JAX_PLATFORMS to the TPU plugin, so this must be a jax.config call
before first jax use, which is why it lives here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_fake = int(os.environ.get("AREC_FAKE_DEVICES", "0"))
if _fake > 1:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_fake}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

from arec.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()   # remote compiles swing 2-20+ min; replay is free


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="JSON config file (see configs/)")
    ap.add_argument("--set", action="append", default=[],
                    metavar="SECTION.FIELD=VALUE",
                    help="config override, e.g. train.batch_size=256")
    ap.add_argument("--recommend", action="store_true",
                    help="skip training; restore + emit top-K lists")
    ap.add_argument("--out", default="",
                    help="submission-style output path for --recommend")
    ap.add_argument("--validate-prep", action="store_true",
                    help="prepare (or load cached) dataset, print its "
                         "deterministic summary, and compare against the "
                         "golden contract in <data_dir>/golden_<dataset>"
                         ".json if present (exit 1 on drift)")
    ap.add_argument("--write-golden", action="store_true",
                    help="with --validate-prep: record the current summary "
                         "as the golden contract")
    return ap.parse_args(argv)


def validate_prep(cfg, write_golden: bool) -> int:
    """Prep-output contract check (arec/data/validate.py)."""
    import os

    from arec.data.io import load_or_prepare
    from arec.data.validate import diff_summaries, prep_summary, summary_digest

    ds = load_or_prepare(cfg.data)
    ds.validate()
    summary = prep_summary(ds)
    print(json.dumps({"digest": summary_digest(summary), **summary},
                     indent=2, sort_keys=True))
    golden_path = os.path.join(cfg.data.data_dir,
                               f"golden_{cfg.data.dataset}.json")
    if write_golden:
        os.makedirs(cfg.data.data_dir, exist_ok=True)
        with open(golden_path, "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)
        print(f"[golden] wrote {golden_path}", file=sys.stderr)
        return 0
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            golden = json.load(f)
        drift = diff_summaries(golden, summary)
        if drift:
            for line in drift:
                print(f"[golden] DRIFT {line}", file=sys.stderr)
            return 1
        print(f"[golden] matches {golden_path}", file=sys.stderr)
    else:
        print(f"[golden] no contract at {golden_path} (use --write-golden)",
              file=sys.stderr)
    return 0


def load_config(args):
    from arec.config import Config
    cfg = Config()
    if args.config:
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    overrides = {}
    for item in args.set:
        key, _, value = item.partition("=")
        if not value:
            raise SystemExit(f"--set needs SECTION.FIELD=VALUE, got {item!r}")
        overrides[key] = value
    return cfg.override(overrides) if overrides else cfg


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args)
    if args.validate_prep:
        return validate_prep(cfg, args.write_golden)
    from arec.train.loop import Trainer
    trainer = Trainer(cfg)
    if args.recommend:
        rows = trainer.recommend(out_path=args.out or None)
        recall = trainer.evaluate()
        print(json.dumps({"users": len(rows),
                          f"recall@{cfg.train.eval_topk}": recall}))
        return 0
    summary = trainer.train()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
