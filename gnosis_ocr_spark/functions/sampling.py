"""Deterministic sampling and dataset splitting for training corpora.

Everything derives from a content/key hash, never ``rand()``: the same
document lands in the same split on every run, every cluster size, and every
resume — the property that makes 100 TB pipeline re-runs reproducible and
train/test contamination auditable.

The hash is the first 15 hex digits of md5 as a BIGINT (< 2^60, no
overflow), chosen because every SQL engine can reproduce it exactly
(DuckDB: ``CAST(concat('0x', substr(md5(k),1,15)) AS BIGINT)``) — unlike
xxhash64, which is Spark-private.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stable_hash(key: Column) -> Column:
    """Deterministic 60-bit integer hash of a string key (engine-portable)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")


def hash_bucket(key: Column, n_buckets: int = 1000) -> Column:
    return (stable_hash(key) % n_buckets).cast("int")


def split_assign(key: Column, train_pm: int = 980, val_pm: int = 10) -> Column:
    """'train' / 'val' / 'test' by per-mille hash bucket (default 98/1/1).
    Assignment is a pure function of the key — adding data never moves an
    existing document across splits."""
    b = hash_bucket(key, 1000)
    return (
        F.when(b < train_pm, "train")
        .when(b < train_pm + val_pm, "val")
        .otherwise("test")
    )


def sample_fraction(df: DataFrame, key_col: str, keep_pm: int) -> DataFrame:
    """Keep ~keep_pm/1000 of rows, deterministically by key hash (the
    reproducible alternative to df.sample)."""
    return df.filter(hash_bucket(F.col(key_col)) < keep_pm)


def cap_per_group(
    df: DataFrame, group_col: str, key_col: str, max_rows: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """At most ``max_rows`` rows per group, chosen deterministically by key
    hash (tie-break on the key itself) — the crawl-balancing quota that stops
    mega-hosts from dominating a corpus. One shuffle on the group key; AQE
    handles skewed groups.

    DETERMINISM CONTRACT: (stable_hash(key), key) is a total order only when
    ``key_col`` is unique within each group. If keys can repeat (e.g. capping
    page rows keyed by url), pass a ``tiebreak_col`` that IS unique per row —
    it is appended as the final sort key; otherwise which duplicate survives
    varies run to run."""
    order = [stable_hash(F.col(key_col)), F.col(key_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_rows)
        .drop("_rk")
    )
