"""MERGE / upsert: apply a changeset (updates + inserts) to a base
table by key — the storage-side mutation primitive the reference's
batch calculator implies but never needs in-memory (its results dict
is rebuilt from scratch each run, `coeff_maker.py:978-1016`); on a
100 TB lakehouse table you cannot rebuild, you merge.

Shape at scale: the classic formulation is a full-outer join
(base ⋈ changeset) + coalesce — TWO shuffled inputs and a join.
``merge_upsert`` instead tags each side with a priority and takes the
argmax-by-priority row per key as ONE partial+final hash aggregation
over the union: a single shuffle, no join, no per-key window sort.
Keys must be unique within each side (the usual primary-key merge
contract), so the struct comparison only ever decides between one
base row and one changeset row. Combined with a date/bucket-
partitioned layout this becomes partition-granular (see
sources/derived.py dynamic-overwrite backfill, q65) — at scale you
merge only the partitions the changeset touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, changeset: DataFrame, key: str) -> DataFrame:
    """Upsert ``changeset`` rows into ``base`` by ``key``: a key
    present in both sides takes the changeset row, a key present in
    one side passes through. Columns are matched by name (changeset
    must carry all base columns).

    Preconditions (the primary-key merge contract, narrower than SQL
    MERGE in two ways):

    - **Keys must be non-null.** ``groupBy`` groups NULL keys
      together, so a NULL-key changeset row would *replace* a
      NULL-key base row — SQL MERGE's ON equality never matches NULL.
      Callers with nullable keys must filter or assert first.
    - **Payload columns must be orderable.** The argmax is a struct
      ``max``; a map-typed payload column fails at runtime. Wrap
      unorderable columns (``map_entries`` / to-json) before merging.

    Within each side keys must be unique (standard PK contract), so
    the struct comparator only ever decides base-vs-changeset via the
    leading ``__pri__`` tag, never via payload values."""
    cols = base.columns
    payload = [c for c in cols if c != key]
    tagged = (
        base.select(*cols).withColumn("__pri__", F.lit(0))
        .unionByName(changeset.select(*cols).withColumn("__pri__", F.lit(1)))
    )
    # argmax-by-priority per key: one hash aggregation. The struct
    # comparator reads __pri__ first, so the payload columns after it
    # never decide the winner (each side contributes at most one row).
    merged = tagged.groupBy(key).agg(
        F.max(F.struct("__pri__", *payload)).alias("__row__")
    )
    return merged.select(
        key, *[F.col(f"__row__.{c}").alias(c) for c in payload]
    )
