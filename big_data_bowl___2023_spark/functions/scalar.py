"""Scalar expression surface (SURVEY.md §2.8 F1–F9).

Thin, typed wrappers over built-in ``pyspark.sql.functions`` — every
one stays JVM-side inside whole-stage codegen; nothing here is a UDF.
The reference's scalar calls map 1:1 (abs MBE:52, pmax MBE:77, round
MO:20, ifelse MBE:45, paste/str_* WIP.R:25-33).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pmax(*cols: Column) -> Column:
    """F4: n-ary elementwise max — R ``pmax`` (MBE:77)."""
    return F.greatest(*cols)


def pmin(*cols: Column) -> Column:
    return F.least(*cols)


def ifelse(cond: Column, yes, no) -> Column:
    """F7: vectorized conditional — R ``ifelse`` (MBE:45, 81-82, 91).
    Nest by passing another ``ifelse`` as ``no``."""
    return F.when(cond, yes).otherwise(no)


def seconds_from_frames(frames: Column, hz: float = 10.0) -> Column:
    """F2: frame→seconds arithmetic — the hard-coded 10 Hz clock
    (MBE:99 ``*0.1``; WIP.R:76)."""
    return frames / F.lit(hz)


def initial_surname(name: Column) -> Column:
    """F8: ``paste(str_sub(first,1,1), last, sep='.')`` — the
    initial+surname construction (WIP.R:25-26)."""
    first = F.split(name, " ").getItem(0)
    last = F.split(name, " ").getItem(1)
    return F.concat_ws(".", F.substring(first, 1, 1), last)
