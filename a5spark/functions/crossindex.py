"""Cross-index encoders: S2 and H3 cells alongside A5, for joins against
datasets keyed by other DGGS systems.

S2 is implemented natively in numpy (a5spark.kernels.s2). H3 stays
DELIBERATELY import-gated rather than reimplemented (round-7 decision):
an H3 index is defined not just by its geometry (icosahedral gnomonic +
aperture-7 hex IJK — reimplementable) but by the canonical base-cell
assignment tables (the 540-entry face-IJK-to-base-cell table and 122-entry
base-cell orientation data in Uber's h3 faceijk.c). Those tables are pure
DATA: they cannot be derived from first principles, and with no `h3`
package or table source available in this environment a from-memory
reconstruction could not be validated — a wrong entry would silently
mis-index every row in its region, strictly worse than an explicit gate.
The UDF uses the `h3` library when importable (argument-order parity
pinned by published doc vectors in tests/test_round7.py, which activate
with the package) and otherwise raises NotImplementedError at execution
time — the plumbing (signature, types, multi-index assignment helper) is
real either way.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from a5spark.kernels import s2 as ks2

try:  # pragma: no cover - availability depends on environment
    import h3 as _h3
except ImportError:  # noqa: SIM105
    _h3 = None


@F.pandas_udf(LongType())
def s2_lonlat_to_cell(lon: pd.Series, lat: pd.Series, level: pd.Series) -> pd.Series:
    lv = level.to_numpy()
    lon_v = lon.to_numpy(np.float64)
    lat_v = lat.to_numpy(np.float64)
    out = np.zeros(len(lon), dtype=np.uint64)
    for l in np.unique(lv):
        m = lv == l
        out[m] = ks2.lonlat_to_cell(lon_v[m], lat_v[m], int(l))
    return pd.Series(out.view(np.int64))


@F.pandas_udf(LongType())
def h3_lonlat_to_cell(lon: pd.Series, lat: pd.Series, resolution: pd.Series) -> pd.Series:
    if _h3 is None:
        raise NotImplementedError(
            "H3 encoding requires the `h3` library, which is not installed "
            "in this environment"
        )
    def _one(la, lo, r):
        v = _h3.latlng_to_cell(la, lo, int(r))  # str (h3>=4) or int (h3<4)
        return int(v, 16) if isinstance(v, str) else v

    out = [_one(la, lo, r) for lo, la, r in zip(lon, lat, resolution)]
    return pd.Series(np.array(out, dtype=np.uint64).view(np.int64))


def assign_cross_index(
    df: DataFrame,
    a5_resolution: int,
    s2_level: int,
    h3_resolution: int | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Attach A5 + S2 (+ H3 when available) cell columns in one pass."""
    from a5spark.functions.udfs import a5_lonlat_to_cell

    out = df.withColumn(
        "a5_cell", a5_lonlat_to_cell(F.col(lon), F.col(lat), F.lit(a5_resolution))
    ).withColumn(
        "s2_cell", s2_lonlat_to_cell(F.col(lon), F.col(lat), F.lit(s2_level))
    )
    if h3_resolution is not None and _h3 is not None:
        out = out.withColumn(
            "h3_cell", h3_lonlat_to_cell(F.col(lon), F.col(lat), F.lit(h3_resolution))
        )
    return out
