"""Bounded persist lifecycle shared by repeat-call cache sites.

``one_slot_persist`` persists a DataFrame and releases the PREVIOUS call's
table for the same slot — the idiom that fixed the round-2 linker leak
(a persist per call that was never unpersisted: the bench doubled storage
by running every query twice).  Side effect callers accept: a still-lazy
result DataFrame from an earlier call loses its cache when a later call
claims the slot — it recomputes correctly, just without the cached read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def one_slot_persist(slot: list, df: DataFrame) -> DataFrame:
    """Persist ``df``; unpersist whatever the slot held before."""
    df = df.persist()
    while slot:
        slot.pop().unpersist()
    slot.append(df)
    return df
