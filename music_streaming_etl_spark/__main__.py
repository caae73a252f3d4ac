"""CLI for the music-streaming KPI pipeline — the drop-in replacement
for the reference's Airflow DAG trigger (one command = one
``etl_rds_s3_to_redshift_kpis`` run, minus the cluster ceremony).

    python -m music_streaming_etl_spark \
        --streams data/streams/*.csv \
        --users data/users/users.csv \
        --songs data/songs/songs.csv \
        --genre-out /tmp/genre_kpis --hourly-out /tmp/hourly_kpis

Batch by default; ``--streaming`` switches the hourly surface to the
Structured Streaming mode (watermarked tumbling windows + upsert).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import types as T

from .plans.pipeline import extract_streams, run_pipeline
from .schemas import SONGS, USERS
from .session import get_spark
from .sources.io import scan_csv_multi

# Minimal songs schema: the columns the pipeline consumes
# (dags/music_streaming_etl_dags.py:178,188-193,204) — full-width CSVs
# (sql/create_tables.sql:15-52) load with schemas.SONGS instead.
SONGS_MIN = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("track_id", T.StringType(), False),
        T.StructField("artists", T.StringType(), True),
        T.StructField("album_name", T.StringType(), True),
        T.StructField("track_name", T.StringType(), True),
        T.StructField("track_genre", T.StringType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="music_streaming_etl_spark")
    ap.add_argument("--streams", nargs="+", required=True, help="stream CSV paths")
    ap.add_argument("--users", required=True, help="users CSV path")
    ap.add_argument("--songs", required=True, help="songs CSV path")
    ap.add_argument("--genre-out", required=True)
    ap.add_argument("--hourly-out", required=True)
    ap.add_argument(
        "--songs-full-schema",
        action="store_true",
        help="songs CSV has all 21 reference columns",
    )
    ap.add_argument(
        "--approx-distinct",
        action="store_true",
        help="HLL unique-listeners (the 100 TB path) instead of exact",
    )
    ap.add_argument(
        "--streaming",
        metavar="CHECKPOINT_DIR",
        help="run the hourly surface as a Structured Streaming drain of"
        " the streams directory (windowed KPIs upserted to --hourly-out"
        " as parquet); pass the checkpoint location",
    )
    ap.add_argument(
        "--watermark",
        default="1 hour",
        help="allowed event lateness in streaming mode (default: 1 hour)",
    )
    args = ap.parse_args(argv)

    spark = get_spark("kpi-pipeline-cli")
    users = scan_csv_multi(spark, args.users, USERS)
    songs = scan_csv_multi(
        spark, args.songs, SONGS if args.songs_full_schema else SONGS_MIN
    )

    if args.streaming:
        from .streaming.kpis import start_kpi_stream

        if len(args.streams) != 1 or not os.path.isdir(args.streams[0]):
            ap.error("--streaming requires --streams to be ONE directory")
        q = start_kpi_stream(
            spark,
            args.streams[0],
            songs,
            args.hourly_out,
            args.streaming,
            watermark=args.watermark,
        )
        q.awaitTermination()
        n = spark.read.parquet(args.hourly_out).count()
        print(json.dumps({"mode": "streaming", "hourly_rows": n}))
        return 0

    streams = extract_streams(spark, args.streams)
    report = run_pipeline(
        spark,
        streams,
        songs,
        users,
        genre_out=args.genre_out,
        hourly_out=args.hourly_out,
        exact_distinct=not args.approx_distinct,
    )
    print(
        json.dumps(
            {
                "genre_rows": report.genre_rows,
                "hourly_rows": report.hourly_rows,
                "checks": {
                    c.name: c.passed
                    for c in report.input_checks + report.output_checks
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
