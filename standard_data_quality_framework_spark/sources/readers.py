"""Source readers — the reference's loader zoo (SURVEY.md §2.1)
re-expressed as Spark scans.

  read_csv            S1/S2 — schema-first CSV (no inferSchema in prod)
  read_vcf            S3  — VCF: '##' metadata header split from the
                       '#CHROM'-headed TSV body, all columns string-typed
                       (the reference parses cells as strings,
                       data_loader.py:93-118); header → map column
  read_patient_json   S4  — nested per-patient JSON with explicit schema,
                       episodes[0] demographics + channel time series
                       exploded to long format (patient_id, channel, ts, v)
  read_binary_dir     S5/S8 — binaryFile scan with id extraction from the
                       path (regexp over input_file_name, S10)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType | str | None = None,
             header: bool = True) -> DataFrame:
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "false")  # all strings, checks coerce
    return r.csv(path)


def read_vcf(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """→ (body_df, meta_df).

    body_df: one string column per '#CHROM'-line field (CHROM, POS, …),
    one row per record — every cell a string, '.' = missing (the
    check layer owns sentinel semantics, config.py).
    meta_df: (file, key, value) parsed from '##key=value' lines.
    Distributed: spark.read.text + per-file header extraction — no
    driver-side file loop.
    """
    lines = (spark.read.text(path)
             .withColumn("file", F.input_file_name()))
    meta = (lines.filter(F.col("value").startswith("##"))
            .select("file",
                    F.regexp_extract("value", r"^##([^=]+)=?(.*)$", 1)
                    .alias("key"),
                    F.regexp_extract("value", r"^##([^=]+)=?(.*)$", 2)
                    .alias("value")))
    header_line = (lines.filter(F.col("value").startswith("#CHROM"))
                   .select("file", F.col("value").alias("header")))
    # column names must be known to build the projection: the header is
    # tiny (one row per file) — a driver fetch of ONE distinct header is
    # the schema-discovery step, not a data collect
    headers = [r.header for r in header_line.select("header")
               .distinct().collect()]
    if not headers:
        raise ValueError(f"no #CHROM header found in {path}")
    cols = headers[0].lstrip("#").split("\t")
    body = (lines.filter(~F.col("value").startswith("#"))
            .withColumn("_f", F.split("value", "\t")))
    for i, c in enumerate(cols):
        body = body.withColumn(c, F.col("_f").getItem(i))
    return body.select("file", *cols), meta


PATIENT_SCHEMA = T.StructType([
    T.StructField("patient_id", T.StringType()),
    T.StructField("episodes", T.ArrayType(T.StructType([
        T.StructField("demographics", T.StructType([
            T.StructField("age", T.DoubleType()),
            T.StructField("gender", T.StringType()),
            T.StructField("weight", T.DoubleType()),
            T.StructField("diabeticStatus", T.StringType()),
        ])),
        T.StructField("time_series", T.MapType(
            T.StringType(),
            T.ArrayType(T.ArrayType(T.DoubleType())))),
    ]))),
])


def read_patient_json(spark: SparkSession, path: str) -> DataFrame:
    """S4: per-patient JSON → long format
    (patient_id, age, gender, weight, diabeticStatus, channel, ts, v).

    episodes[0] per the reference (data_loader.py:150-170); channel
    series [[ts_ms, value], …] exploded; -1 weight is a missing
    sentinel handled by the check layer, not here."""
    df = spark.read.schema(PATIENT_SCHEMA).json(path)
    ep = df.select("patient_id",
                   F.col("episodes").getItem(0).alias("ep"))
    demo = ep.select(
        "patient_id",
        F.col("ep.demographics.age").alias("age"),
        F.col("ep.demographics.gender").alias("gender"),
        F.col("ep.demographics.weight").alias("weight"),
        F.col("ep.demographics.diabeticStatus").alias("diabeticStatus"),
        F.explode_outer("ep.time_series").alias("channel", "series"))
    return demo.select(
        "patient_id", "age", "gender", "weight", "diabeticStatus",
        "channel",
        F.explode_outer("series").alias("point")).select(
        "patient_id", "age", "gender", "weight", "diabeticStatus",
        "channel",
        F.timestamp_millis(F.col("point").getItem(0).cast("long"))
        .alias("ts"),
        F.col("point").getItem(1).alias("v"))


def read_binary_dir(spark: SparkSession, path: str,
                    id_pattern: str = r"([^/]+)\.[A-Za-z0-9]+$",
                    glob: str | None = None) -> DataFrame:
    """S5/S8/S10: binaryFile scan + id from path.

    (id, path, length, content) — the reference walks directories on
    the driver (utils.py:9-51); here the scan itself is distributed
    and partition-pruned by the glob."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    return df.select(
        F.regexp_extract(F.col("path"), id_pattern, 1).alias("id"),
        "path", "length", "content")
