"""CLI mirroring the reference's single entry point.

The reference installs one ``DeezyMatch`` console script dispatched by
``--deezy_mode`` ∈ {train, finetune, inference, combine_vecs,
candidate_ranker} (setup.py:55-58, utils.py:141-162). Same surface here:

    python -m deezymatch_ray --deezy_mode train -i pairs.tsv -m mymodel
    python -m deezymatch_ray --deezy_mode inference -m models/mymodel \
        -i test_pairs.tsv -o /tmp/preds
    python -m deezymatch_ray --deezy_mode candidate_ranker \
        -m models/mymodel --queries q.txt --candidates c.txt -o /tmp/rank

The CLI owns the Ray session (guarded init — the library never calls
ray.init; see __ray_entry__ contract). Note the reference's own CLI
ranker path has a latent bug (reads ``args.use_predict`` where the flag
is ``--calc_predict``, utils.py:449 vs :487) — reproduced here as the
WORKING behavior, not the bug.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="deezymatch_ray")
    p.add_argument("--deezy_mode", required=True,
                   choices=["train", "finetune", "inference", "combine_vecs",
                            "candidate_ranker"])
    p.add_argument("-i", "--input", help="pairs file (TSV or parquet)")
    p.add_argument("-m", "--model", default="model",
                   help="model name (train) or model dir (other modes)")
    p.add_argument("--models_dir", default="models")
    p.add_argument("--pretrained_model", help="model dir to fine-tune from")
    p.add_argument("-o", "--output")
    p.add_argument("--mode", default="test", choices=["test", "vect"],
                   help="inference mode")
    p.add_argument("--one_column", action="store_true")
    p.add_argument("--queries")
    p.add_argument("--candidates")
    p.add_argument("--ranking_metric", default="faiss",
                   choices=["faiss", "cosine", "conf"])
    p.add_argument("--selection_threshold", type=float, default=10.0)
    p.add_argument("--num_candidates", type=int, default=10)
    p.add_argument("--length_diff", type=int)
    p.add_argument("--calc_predict", action="store_true")
    p.add_argument("--calc_cosine", action="store_true")
    p.add_argument("--plan", default="global", choices=["global", "blocked"])
    p.add_argument("-f", "--input_yaml",
                   help="reference-style input_dfm.yaml (train/finetune/"
                        "inference config; utils.py:141-162)")
    p.add_argument("-n", "--cutoff", type=int,
                   help="inference: over-read 2n rows, trim to first n "
                        "valid (data_processing.py:332-335,403)")
    p.add_argument("-tn", "--number_test_rows", type=int, default=-1,
                   help="candidate_ranker: rank only the first N queries "
                        "(candidateRanker.py:355-358)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deezymatch_ray import api
    from deezymatch_ray.config import DEFAULT_CONFIG, from_yaml

    cfg = from_yaml(args.input_yaml) if args.input_yaml else DEFAULT_CONFIG

    try:
        if args.deezy_mode == "train":
            d = api.train(args.input, model_name=args.model,
                          models_dir=args.models_dir, cfg=cfg)
            print(json.dumps({"model_dir": d}))
        elif args.deezy_mode == "finetune":
            d = api.finetune(args.input, args.pretrained_model,
                             model_name=args.model, models_dir=args.models_dir,
                             cfg=cfg)
            print(json.dumps({"model_dir": d}))
        elif args.deezy_mode == "inference":
            ds, metrics = api.inference(args.model, args.input, mode=args.mode,
                                        cfg=cfg if args.input_yaml else None,
                                        output_path=args.output,
                                        one_column=args.one_column,
                                        cutoff=args.cutoff)
            print(json.dumps({"rows": ds.count(), "metrics": metrics,
                              "output": args.output}))
        elif args.deezy_mode == "combine_vecs":
            ds, _ = api.inference(args.model, args.input, mode="vect",
                                  one_column=args.one_column)
            api.combine_vecs(ds, output_path=args.output)
            print(json.dumps({"rows": ds.count(), "output": args.output}))
        else:  # candidate_ranker
            out = api.candidate_ranker(
                args.queries, args.candidates, args.model,
                ranking_metric=args.ranking_metric,
                selection_threshold=args.selection_threshold,
                num_candidates=args.num_candidates,
                length_diff=args.length_diff,
                calc_predict=args.calc_predict,
                calc_cosine=args.calc_cosine,
                plan=args.plan,
                number_test_rows=args.number_test_rows,
            )
            if args.output:
                out.write_parquet(args.output)
            print(json.dumps({"rows": out.count(), "output": args.output}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
