"""KBModel CLI (SURVEY §3.4):

    python -m kgforge.model learn --triples DIR --out DIR
    python -m kgforge.model synth --model DIR --scale 2.0 --seed 7 --out DIR
                                  [--rules]  # mine + replay horn rules

learn: triples parquet → model histograms parquet + N-Triples export.
synth: model → synthesized triples parquet (optionally rule-replayed).
Owns its Ray session (guarded)."""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="kgforge.model")
    sub = ap.add_subparsers(dest="cmd", required=True)
    lp = sub.add_parser("learn")
    lp.add_argument("--triples", required=True)
    lp.add_argument("--out", required=True)
    lp.add_argument("--tier", default="m3", choices=["m1", "m2", "m3"],
                    help="KB model tier (J3 plugin protocol; default m3)")
    lp.add_argument("--rules-file", default=None,
                    help="externally-mined AMIE rule file (m3 only; "
                         "default: mine natively)")
    sp = sub.add_parser("synth")
    sp.add_argument("--model", required=True)
    sp.add_argument("--scale", type=float, default=1.0)
    sp.add_argument("--seed", type=int, default=7)
    sp.add_argument("--out", required=True)
    sp.add_argument("--rules", action="store_true")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
        ray.data.DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    if args.cmd == "learn":
        from ..nlp_core import AliasResource
        from .learn import write_model
        from .protocol import M3Learner, get_learner

        # column pushdown: every learner consumes only (subj, pred, obj);
        # n_sources / first_url would ride the scan and be dropped
        triples = rd.read_parquet(args.triples, columns=["subj", "pred", "obj"])
        if args.rules_file and args.tier != "m3":
            ap.error(f"--rules-file requires --tier m3 (got --tier {args.tier})")
        if args.tier == "m3" and args.rules_file:
            learner = M3Learner(rules_source=args.rules_file)
        else:
            learner = get_learner(args.tier)
        model = learner.learn(triples, AliasResource.default().id_type)
        write_model(model, args.out)
        n_rules = len(model["rules"]) if "rules" in model else 0
        print(f"[learn] tier={args.tier}: wrote {len(model)} tables "
              f"({n_rules} rules) -> {args.out}")
    else:
        from .learn import read_model
        from .synth import synthesize

        model = read_model(args.model)
        syn = synthesize(model, scale=args.scale, seed=args.seed)
        if args.rules:
            import pyarrow.parquet as pq

            from .rules import replay_rules

            rules_path = os.path.join(args.model, "rules.parquet")
            if not os.path.exists(rules_path):
                ap.error(
                    f"--rules: model at {args.model} has no rules.parquet "
                    "(only m3-tier `learn` writes rules; re-learn with --tier m3)"
                )
            rules = pq.read_table(rules_path).to_pandas()
            syn = replay_rules(syn, rules, seed=args.seed)
            print(f"[synth] replayed {len(rules)} learned rules")
        # one execution: materialize, then both the write and the count
        # read the pinned blocks (write_parquet + count would otherwise
        # each run the whole synthesize/replay lineage)
        syn = syn.materialize()
        syn.write_parquet(args.out)
        print(f"[synth] wrote {syn.count()} triples -> {args.out}")

    # only tear down a session this CLI created — a host process calling
    # main() programmatically keeps its own Ray session
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
