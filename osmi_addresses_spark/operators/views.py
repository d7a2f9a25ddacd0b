"""Derived MapServer views over nodes_with_addresses / interpolation
(SURVEY.md §1.3 / §2.2 F13; mapserver/addresses.map:513,561,753,798,846,893).

MapServer's "[col]" substitution renders NULL as '' — hence the coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _e(c: str):
    return F.coalesce(F.col(c), F.lit(""))


def no_addr_street(nwa: DataFrame) -> DataFrame:
    """addresses.map:798."""
    return nwa.filter(
        (F.col("is_ip") == 0)
        & (_e("street") == "")
        & (_e("fulladdr") == "")
        & (_e("place") == "")
    )


def street_not_found(nwa: DataFrame) -> DataFrame:
    """addresses.map:846."""
    return nwa.filter(
        (F.col("is_ip") == 0)
        & (_e("street") != "")
        & (_e("road_id") == "")
        & (_e("nody_place_id") == "")
        & (_e("wayy_place_id") == "")
    )


def place_not_found(nwa: DataFrame) -> DataFrame:
    """addresses.map:893."""
    return nwa.filter(
        (F.col("is_ip") == 0)
        & (_e("place") != "")
        & (_e("nody_place_id") == "")
        & (_e("wayy_place_id") == "")
    )


def nodes_with_addresses_defined(nwa: DataFrame) -> DataFrame:
    """addresses.map:561 — is_ip=0 AND node_id > 0."""
    return nwa.filter((F.col("is_ip") == 0) & (F.col("node_id").cast("long") > 0))


def nodes_with_addresses_interpolated(nwa: DataFrame) -> DataFrame:
    """addresses.map:513."""
    return nwa.filter(F.col("is_ip") == 1)


def interpolation_errors(interp: DataFrame) -> DataFrame:
    """addresses.map:753."""
    return interp.filter(F.coalesce(F.col("error"), F.lit("")) != "")
