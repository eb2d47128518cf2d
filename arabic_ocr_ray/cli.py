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
    python -m arabic_ocr_ray.cli curate  -i extracted/ -b bench.parquet -o out/
    python -m arabic_ocr_ray.cli export  -i curated/ -o shards/ --n-shards 16
    python -m arabic_ocr_ray.cli index build  -i embeddings.parquet -x idx/
    python -m arabic_ocr_ray.cli index append -i new.parquet -x idx/
    python -m arabic_ocr_ray.cli index probe  -x idx/ --ids 0,1,2 -k 5
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
    px.add_argument("--mixed", action="store_true",
                    help="per-row html/PDF dispatch inside the fused "
                         "stage (%%PDF- payloads take the stdlib "
                         "layout parser)")

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

    pc_ = sub.add_parser(
        "curate", help="decontaminate → paragraph dedup → token gate")
    pc_.add_argument("-i", "--input", required=True,
                     help="parquet of (url, text) docs")
    pc_.add_argument("-b", "--bench", required=True,
                     help="parquet of benchmark/eval texts (text col)")
    pc_.add_argument("-o", "--output", required=True)
    pc_.add_argument("--min-tokens", type=int, default=5)
    pc_.add_argument("--k-gram", type=int, default=8)

    pp = sub.add_parser(
        "export", help="deterministic training shards (LCG order)")
    pp.add_argument("-i", "--input", required=True,
                    help="parquet of curated docs")
    pp.add_argument("-o", "--output", required=True)
    pp.add_argument("--n-shards", type=int, default=16)
    pp.add_argument("--id-col", default="url")
    pp.add_argument("--size-col", default=None)

    pi = sub.add_parser(
        "index", help="materialized IVF ANN index over an embedding "
                      "column (build / incremental append / probe)")
    pi.add_argument("action", choices=["build", "append", "probe"])
    pi.add_argument("-x", "--index", required=True,
                    help="index directory (cell-partitioned parquet)")
    pi.add_argument("-i", "--input", default=None,
                    help="embeddings parquet (build/append)")
    pi.add_argument("--ids", default=None,
                    help="comma-separated query vec_ids (probe)")
    pi.add_argument("-k", type=int, default=5)
    pi.add_argument("--nprobe", type=int, default=None)
    pi.add_argument("--clusters", type=int, default=16)
    pi.add_argument("--id-col", default="vec_id")
    pi.add_argument("--col", default="embedding")
    pi.add_argument("-o", "--output", default=None,
                    help="probe: write result parquet here instead of "
                         "printing rows")

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
                            reading_order=args.reading_order,
                            mixed=args.mixed)
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
        elif args.mode == "curate":
            from .pipelines.curate import curate_corpus_v3
            from .sources.parquet import read_parquet_clean

            out = curate_corpus_v3(
                read_parquet_clean(args.input),
                read_parquet_clean(args.bench),
                k_gram=args.k_gram, min_tokens=args.min_tokens)
            out.write_parquet(args.output)
            n = read_parquet_clean(args.output,
                                   columns=["url"]).count()
            print(json.dumps({"path": args.output, "survivors": n}))
        elif args.mode == "index":
            from .functions import ann
            from .sources.parquet import read_parquet_clean

            if args.action == "build":
                if not args.input:
                    p.error("index build requires -i/--input")
                C = ann.build_ivf_index(
                    read_parquet_clean(args.input), args.index,
                    n_clusters=args.clusters,
                    id_col=args.id_col, col=args.col)
                meta = json.load(open(f"{args.index}/_meta.json"))
                print(json.dumps({"index": args.index,
                                  "cells": int(C.shape[0]),
                                  "rows": meta["n_rows"]}))
            elif args.action == "append":
                if not args.input:
                    p.error("index append requires -i/--input")
                new_ds = read_parquet_clean(args.input)
                added = new_ds.count()
                ann.append_ivf_index(new_ds, args.index,
                                     id_col=args.id_col, col=args.col)
                meta = json.load(open(f"{args.index}/_meta.json"))
                print(json.dumps({"index": args.index,
                                  "rows_added": int(added),
                                  "rows_total": meta["n_rows"]}))
            else:  # probe
                if not args.ids:
                    p.error("index probe requires --ids")
                qids = [int(x) for x in args.ids.split(",") if x != ""]
                out = ann.knn_ivf_probe(args.index, qids, k=args.k,
                                        nprobe=args.nprobe,
                                        id_col=args.id_col,
                                        col=args.col)
                if args.output:
                    out.write_parquet(args.output)
                    print(json.dumps({"path": args.output,
                                      "rows": out.count()}))
                else:
                    rows = out.to_pandas().sort_values(
                        ["query_id", "rank"]).to_dict("records")
                    print(json.dumps({"rows": rows}, default=int))
        elif args.mode == "export":
            from .pipelines.export import export_training_shards
            from .sources.parquet import read_parquet_clean

            man = export_training_shards(
                read_parquet_clean(args.input), args.output,
                n_shards=args.n_shards, id_col=args.id_col,
                size_col=args.size_col).to_pandas()
            print(json.dumps({
                "path": args.output,
                "shards": int(len(man)),
                "docs": int(man["n_docs"].sum()),
            }))
    finally:
        if owns_session:  # never tear down a session we didn't start
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
