"""Engine CLI — the U4/U6 extension surface done right.

The reference's mode switch is a hardcoded ``train = False`` edited in
source (segment_words.py:260) and its paths are ``-i/-o/-w`` flags
(segment_words.py:236-252); here every mode is a real subcommand.  This
is the only place in the package (besides tests/bench) that owns a Ray
session.

    python -m arabic_ocr_ray.cli extract -i pages.parquet -o out/ [--no-resume]
    python -m arabic_ocr_ray.cli train   -i pages.parquet -s spans.parquet -m model.json
    python -m arabic_ocr_ray.cli eval    -i pages.parquet -e out/
    python -m arabic_ocr_ray.cli gen     -o pages.parquet -n 1000 [--seed 42]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="arabic_ocr_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="mode", required=True)

    px = sub.add_parser("extract", help="pages parquet → extracted text")
    px.add_argument("-i", "--input", required=True)
    px.add_argument("-o", "--output", required=True)
    px.add_argument("-m", "--model", default=None)
    px.add_argument("--batch-size", type=int, default=64)
    px.add_argument("--num-partitions", type=int, default=64)
    px.add_argument("--no-resume", action="store_true")
    px.add_argument("--reading-order", choices=["document", "rtl"],
                    default="document",
                    help="rtl = reference's right-to-left word order "
                         "(segment_words.py:162-170)")

    pt = sub.add_parser("train", help="pages + labeled spans → model json")
    pt.add_argument("-i", "--input", required=True)
    pt.add_argument("-s", "--spans", required=True)
    pt.add_argument("-m", "--model", required=True)

    pe = sub.add_parser("eval", help="byte-identical match rate report")
    pe.add_argument("-i", "--input", required=True, help="pages parquet (golden)")
    pe.add_argument("-e", "--extracted", required=True, help="extraction output dir")

    pg = sub.add_parser("gen", help="write a synthetic pages corpus")
    pg.add_argument("-o", "--output", required=True)
    pg.add_argument("-n", type=int, default=1000)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--scale", type=int, default=1)

    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    try:
        if args.mode == "extract":
            from .model import DEFAULT_MODEL_PATH
            from .pipelines.extract import run_extract

            m = run_extract(args.input, args.output,
                            model_path=args.model or DEFAULT_MODEL_PATH,
                            batch_size=args.batch_size,
                            num_partitions=args.num_partitions,
                            resume=not args.no_resume,
                            reading_order=args.reading_order)
            print(json.dumps(m))
        elif args.mode == "train":
            from .pipelines.train import train_model

            model, stats = train_model(args.input, args.spans)
            model.save(args.model)
            print(json.dumps(stats))
        elif args.mode == "eval":
            import ray.data as rd

            from .pipelines.evaluate import evaluate_extraction
            from .state.lineage import dedup_superseded

            # resumed outputs can hold a stale error row next to its
            # retried ok row — dedup per url (prefer non-error) so the
            # eval join never double-counts (ADVICE r1)
            ext = dedup_superseded(
                rd.read_parquet(args.extracted,
                                columns=["url", "extracted_text",
                                         "status", "part"])
            ).select_columns(["url", "extracted_text"])
            print(json.dumps(evaluate_extraction(ext, args.input)))
        elif args.mode == "gen":
            from .sources.pages import ensure_bench_corpus

            ensure_bench_corpus(args.output, args.n, seed=args.seed,
                                scale=args.scale)
            print(json.dumps({"path": args.output, "n": args.n}))
    finally:
        if owns_session:  # never tear down a session we didn't start
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
