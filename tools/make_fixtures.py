"""Convert the bundled public observational datasets to parquet fixtures.

The three series are public scientific data (the same ones the reference
bundles as .npy — data/__init__.py:6-64):

- spotted_star: KIC 9655172 Kepler light curve (t, y, dy), 2148 samples.
- sunspots: WDC-SILSO daily total sunspot number, 1818-2021, sentinel −1.
- tsi: PMOD composite Total Solar Irradiance, 1978-2012, sentinel −99.

Usage: python tools/make_fixtures.py [src_dir] [out_dir]
(defaults: the reference's data dir → periodicity_spark/data/)

The parquet outputs are committed to the repo so tests and loaders never
depend on the reference checkout at runtime.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_SRC = "/root/reference/src/periodicity/data"
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "periodicity_spark", "data")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    os.makedirs(out, exist_ok=True)

    t, y, dy = np.load(os.path.join(src, "spotted_star.npy"))
    pq.write_table(
        pa.table(
            {
                "series_id": np.repeat("spotted_star", len(t)),
                "time": t.astype(float),
                "value": y.astype(float),
                "err": dy.astype(float),
            }
        ),
        os.path.join(out, "spotted_star.parquet"),
    )
    print(f"spotted_star: {len(t)} rows")

    t, y = np.load(os.path.join(src, "sunspots.npy"))
    pq.write_table(
        pa.table(
            {
                "series_id": np.repeat("sunspots", len(t)),
                "time": t.astype(float),
                "value": y.astype(float),
            }
        ),
        os.path.join(out, "sunspots.parquet"),
    )
    print(f"sunspots: {len(t)} rows")

    t, y = np.load(os.path.join(src, "tsi.npy"))
    pq.write_table(
        pa.table(
            {
                "series_id": np.repeat("tsi", len(t)),
                "time": t.astype(float),
                "value": y.astype(float),
            }
        ),
        os.path.join(out, "tsi.parquet"),
    )
    print(f"tsi: {len(t)} rows")


if __name__ == "__main__":
    main()
