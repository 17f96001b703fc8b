#!/usr/bin/env python3
"""Convert the reference's XLSX resource workbooks to per-sheet parquet (S4).

The reference loads its institution/category/installation-facility/
access-request resource workbook with `pd.read_excel(path, sheet_name=None)`
(synth/resources.py:141-143) — every sheet as one DataFrame. The Spark
engine reads those sheets as parquet fixtures (etl/Schemas.scala declares
the per-sheet schemas); this script is the offline converter a user runs
once per workbook:

    python3 scripts/xlsx_to_parquet.py resources.xlsx outdir/

Writes `outdir/<sheet_name>.parquet` for every sheet, sheet names
lower-snake-cased to match the Rebuild CLI's expected resource layout
(category.parquet, institution.parquet, installation_facility.parquet,
access_request.parquet).

Requires pandas + openpyxl + pyarrow (driver-side tooling, not part of the
Spark library).
"""
import re
import sys
from pathlib import Path

import pandas as pd


def snake(name: str) -> str:
    s = re.sub(r"[^0-9A-Za-z]+", "_", name.strip())
    s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", s)
    return re.sub(r"_+", "_", s).strip("_").lower()


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    xlsx, outdir = Path(sys.argv[1]), Path(sys.argv[2])
    outdir.mkdir(parents=True, exist_ok=True)
    # sheet_name=None == every sheet, the reference's exact call shape
    sheets = pd.read_excel(xlsx, sheet_name=None)
    for sheet, df in sheets.items():
        out = outdir / f"{snake(sheet)}.parquet"
        df.to_parquet(out, index=False)
        print(f"{sheet!r}: {len(df)} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
