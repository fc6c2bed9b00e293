"""Fuzzy entity resolution: blocked edit-distance matching.

The record-linkage step of warehouse ingestion (dirty feed → master
dimension) and the string cousin of the embedding near-dup family. The
scale discipline is identical to MinHash-LSH (dedup.py): NEVER compare
all pairs — generate a cheap blocking key, equi-join on it (shuffle is
O(collisions), AQE splits hot blocks), and run the O(len²) Levenshtein
kernel only on candidates inside a block. Both engines compute
Levenshtein as an exact integer, so results hash-match bit-for-bit.

Block-key design notes (the part that decides recall): it must be
STABLE under the dirt you expect — here a digit-tail key survives
punctuation/prefix corruption; phonetic keys (soundex) survive vowel
typos; q-gram keys survive single edits at any position. Multiple
blocking passes OR'd together raise recall the same way LSH multi-probe
does.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_match(
    dirty: DataFrame,
    master: DataFrame,
    block_fn: Callable[[Column], Column],
    max_dist: int = 2,
    dirty_name: str = "name",
    master_name: str = "name",
    dirty_id: str = "id",
    master_id: str = "id",
) -> DataFrame:
    """Candidate matches (dirty_id, master_id, name, master_name, dist)
    with ``dist = levenshtein(...) <= max_dist``, compared only within
    equal blocking-key values; ``block_fn`` maps each side's name
    Column to its blocking key (e.g. digit tail, soundex, q-gram)."""
    d = dirty.select(
        F.col(dirty_id).alias("dirty_id"),
        F.col(dirty_name).alias("name"),
        block_fn(F.col(dirty_name)).alias("_bk"),
    )
    m = master.select(
        F.col(master_id).alias("master_id"),
        F.col(master_name).alias("master_name"),
        block_fn(F.col(master_name)).alias("_bk"),
    )
    return (
        d.join(m, "_bk")
        .withColumn("dist", F.levenshtein(F.col("name"), F.col("master_name")))
        .filter(F.col("dist") <= max_dist)
        .select("dirty_id", "master_id", "name", "master_name", "dist")
    )
