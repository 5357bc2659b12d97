"""User-facing command surface: ``python -m data_model_spark <cmd>``.

The analogue of the reference's ``eopf-geozarr convert|validate|info`` CLI
(`cli.py:1057-1206`), over the engine's Spark pipelines:

* ``convert``  — image table -> validated multiscale tile pyramid through
  the checkpointed resumable sink (re-runnable; skips valid levels).
* ``validate`` — metadata-document validation (store-root / layout rules,
  `data_api/geozarr/store.py:30-129`); prints the issue table, exit 1 if
  any document fails.
* ``info``     — per-level summary of a written tile pyramid.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from .session import get_spark

    return get_spark(app_name=app)


def cmd_convert(args) -> int:
    from pyspark.sql import functions as F

    from .operators import tiling
    from .operators.resume import ResumableTileWrite
    from .sources import images as img_src

    spark = _spark("dms-convert")
    if args.to_zarr:
        # write-side parity with the reference's convert OUTPUT (a GeoZarr
        # store, conversion/geozarr.py:974-1183): tile pyramid -> Zarr v3
        from .operators.zarr_sink import write_geozarr
        from .sources.zarr_store import store_info

        if args.zarr_input:
            from .sources.zarr_store import zarr_tiles

            frags = zarr_tiles(
                spark, args.zarr_input, min_dimension=args.min_dimension
            )
        else:
            images = (
                spark.read.parquet(args.input)
                if args.input
                else img_src.generate_images_df(spark, args.n_images)
            )
            frags = tiling.build_tiles(
                images, min_dimension=args.min_dimension, repartition=False
            )
        merged = tiling.merge_tiles(frags)
        n_chunks = write_geozarr(
            merged, args.output, shard_tiles=args.shard_tiles
        ).count()
        print(json.dumps({"n_chunks": n_chunks, **store_info(args.output)}))
        return 0
    if args.zarr_input:
        # the reference's first action on real data (cli.py:174-179):
        # point `convert` at a Zarr store.  Chunks are already lossless
        # raw arrays, so the PSNR gate does not apply; the store's own
        # geo attributes anchor the tile cut.
        from .sources.zarr_store import zarr_tiles

        frags = zarr_tiles(spark, args.zarr_input, min_dimension=args.min_dimension)
        merged = tiling.merge_tiles(frags).persist()
        levels = sorted(
            r.level for r in merged.select("level").distinct().collect()
        )
        sink = ResumableTileWrite(
            args.output,
            args.checkpoint or args.output + "_ckpt",
            layout=args.layout,
        )
        results = sink.run(spark, merged, levels, max_retries=args.max_retries)
        print(
            json.dumps(
                {
                    "zarr_input": args.zarr_input,
                    "n_merged_tiles": merged.count(),
                    "levels_written": results["written"],
                    "levels_skipped": results["skipped"],
                    "levels_revalidated": results["revalidated"],
                    "output": args.output,
                }
            )
        )
        return 0
    if args.input:
        images = spark.read.parquet(args.input)
    else:
        images = img_src.generate_images_df(spark, args.n_images)
    images = images.cache()
    n = images.count()
    # the PSNR gate actually gates: only validated images are tiled
    valid_ids = (
        tiling.validate_images(images)
        .filter(F.col("psnr_db") >= args.min_psnr_db)
        .select("image_id")
    )
    gated = images.join(valid_ids, "image_id", "left_semi").cache()
    n_valid = gated.count()
    merged = tiling.merge_tiles(
        tiling.build_tiles(gated, min_dimension=args.min_dimension, repartition=False)
    ).persist()
    levels = sorted(r.level for r in merged.select("level").distinct().collect())
    sink = ResumableTileWrite(
        args.output,
        args.checkpoint or args.output + "_ckpt",
        layout=args.layout,
    )
    results = sink.run(spark, merged, levels, max_retries=args.max_retries)
    print(
        json.dumps(
            {
                "n_images": n,
                "n_valid": n_valid,
                "n_merged_tiles": merged.count(),
                "levels_written": results["written"],
                "levels_skipped": results["skipped"],
                "levels_revalidated": results["revalidated"],
                "output": args.output,
            }
        )
    )
    return 0


def cmd_validate(args) -> int:
    from .operators import validate as V
    from .sources.tables import local_df

    spark = _spark("dms-validate")
    if args.zarr:
        # reference `validate STORE` (cli.py -> store.py pydantic checks):
        # derive the layout documents from the store, run the same rules
        docs = local_df(
            spark,
            V.docs_from_zarr_store(args.zarr),
            "store_id string, doc_type string, doc string",
        )
    elif args.fixture:
        docs = local_df(
            spark, V.FIXTURE_DOCS, "store_id string, doc_type string, doc string"
        )
    else:
        docs = spark.read.parquet(args.docs)
    issues = V.validate_docs(docs).collect()
    for r in issues:
        print(f"{r.store_id}\t{r.doc_type}\t{r.code}")
    print(json.dumps({"n_documents": docs.count(), "n_issues": len(issues)}))
    return 1 if issues else 0


def cmd_info(args) -> int:
    from pyspark.sql import functions as F

    if args.zarr:
        # reference `info` prints the store hierarchy (cli.py:1166-1206);
        # pure-metadata walk, no Spark session needed
        from .sources.zarr_store import store_info

        print(json.dumps(store_info(args.path)))
        return 0
    spark = _spark("dms-info")
    df = spark.read.parquet(args.path)
    summary = (
        df.groupBy("level")
        .agg(
            F.count("*").alias("n_tiles"),
            F.min("tile_x").alias("tx_min"),
            F.max("tile_x").alias("tx_max"),
            F.min("tile_y").alias("ty_min"),
            F.max("tile_y").alias("ty_max"),
            F.sum("px_cnt").alias("n_pixels"),
        )
        .orderBy("level")
        .collect()
    )
    print(
        json.dumps(
            {
                "path": args.path,
                "n_levels": len(summary),
                "levels": [r.asDict() for r in summary],
            }
        )
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="data_model_spark",
        description="PySpark-native GeoZarr tile-grid engine",
    )
    p.add_argument("--version", action="version", version="%(prog)s 0.2.0")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("convert", help="image table -> checkpointed tile pyramid")
    c.add_argument("output", help="output tile-table path (partitioned parquet)")
    c.add_argument("--input", help="images parquet path (default: synthesize)")
    c.add_argument(
        "--zarr-input",
        help="Zarr v3 store path: convert its 2-D uint16 arrays instead of "
        "an image table (geo anchors from array attributes x0/y0_top/pixel_m)",
    )
    c.add_argument(
        "--to-zarr",
        action="store_true",
        help="write OUTPUT as a GeoZarr-shaped Zarr v3 store (multiscales "
        "metadata, one chunk per merged tile) instead of parquet tiles",
    )
    c.add_argument(
        "--shard-tiles",
        type=int,
        default=None,
        metavar="K",
        help="with --to-zarr: write K x K-tile sharding_indexed shard "
        "objects (the reference's --enable-sharding layout) instead of "
        "one object per tile",
    )
    c.add_argument("--n-images", type=int, default=64, help="synthetic image count")
    c.add_argument("--min-dimension", type=int, default=64)
    c.add_argument("--min-psnr-db", type=float, default=40.0)
    c.add_argument("--max-retries", type=int, default=3)
    c.add_argument(
        "--layout",
        choices=["bands", "zorder"],
        default="bands",
        help="physical clustering of each level partition: y-band hash "
        "(scaling default) or Morton Z-order (tight 2-D row-group stats)",
    )
    c.add_argument("--checkpoint", help="checkpoint table path (default: OUTPUT_ckpt)")
    c.set_defaults(fn=cmd_convert)

    v = sub.add_parser("validate", help="validate metadata documents")
    v.add_argument("--docs", help="parquet of (store_id, doc_type, doc)")
    v.add_argument(
        "--fixture", action="store_true", help="validate the built-in fixture docs"
    )
    v.add_argument(
        "--zarr",
        metavar="STORE",
        help="validate a Zarr v3 store's layout documents (the reference's "
        "`validate STORE` workflow)",
    )
    v.set_defaults(fn=cmd_validate)

    i = sub.add_parser("info", help="summarize a written tile pyramid")
    i.add_argument("path")
    i.add_argument(
        "--zarr", action="store_true", help="PATH is a Zarr v3 store: print its hierarchy"
    )
    i.set_defaults(fn=cmd_info)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "validate" and not (args.fixture or args.docs or args.zarr):
        print("validate: need --docs PATH, --zarr STORE or --fixture", file=sys.stderr)
        return 2
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
