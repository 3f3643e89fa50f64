"""CSV time-series ingest (reference S1/S2, /root/reference/app.py:156-175,
1597-1650).

The reference reads an uploaded CSV (encoding euc-kr), casts the value
column to float, and relies on file row order as time. Spark-side we
make the ordinal explicit at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_timeseries_csv(
    spark: SparkSession,
    path: str,
    value_col: str,
    process_col: str | None = None,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Read a CSV into the long-form ``(series_id, t, value)`` model.

    * ``value`` cast to double (reference casts float32 at app.py:160;
      we standardize on double and let the oracle compare at rounded
      precision).
    * rows with null value dropped (P1, app.py:184).
    * no ``process_col`` → single synthetic series "0" (the reference's
      sliding-window path then splits it, app.py:1783-1794).
    * ``t`` = 0-based ingest order within series. For a single local
      file this matches file order; on a cluster, order within a series
      is whatever the source provides — callers needing exact file order
      should supply an explicit time column instead.
    """
    if encoding.lower() not in (
        "iso-8859-1", "us-ascii", "utf-16", "utf-16be", "utf-16le", "utf-32", "utf-8",
    ):
        # Spark 4 restricts CSV charsets to a short allow-list; the
        # reference's euc-kr (app.py:159) needs the full JVM charset
        # set back
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    raw = (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .csv(path)
    )
    return to_long_form(raw, value_col, process_col)


def to_long_form(
    raw: DataFrame, value_col: str, process_col: str | None = None
) -> DataFrame:
    """Normalize any raw wide table to the long-form
    ``(series_id, t, value)`` model (shared by the CSV/Excel sources)."""
    raw = raw.withColumn("_file_order", F.monotonically_increasing_id())
    series = F.col(process_col).cast("string") if process_col else F.lit("0")
    df = (
        raw.where(F.col(value_col).isNotNull())
        .select(
            series.alias("series_id"),
            F.col("_file_order"),
            F.col(value_col).cast("double").alias("value"),
        )
        .where(F.col("value").isNotNull())
    )
    w = Window.partitionBy("series_id").orderBy("_file_order")
    return df.select(
        "series_id",
        (F.row_number().over(w) - F.lit(1)).alias("t"),
        "value",
    )


def read_uploaded_payload(
    spark: SparkSession,
    contents: str,
    filename: str,
    encoding: str = "utf-8",
) -> DataFrame:
    """S2 — decode an UPLOADED base64 payload to a wide DataFrame (the
    reference's ``parse_contents``, app.py:1597-1650: the Dash upload
    widget delivers ``"data:<mime>;base64,<payload>"`` plus the
    filename, which routes csv vs xls).

    Mirrored behavior: split on the first comma, base64-decode, then
    ``csv`` in filename → text CSV at ``encoding`` (the reference uses
    utf-8 here; its file-path reader uses euc-kr), ``xls`` → Excel from
    the raw bytes (openpyxl when present, else the stdlib zip+XML
    parser below — ``zipfile`` accepts the in-memory buffer directly).
    Uploads are driver-sized by construction, so a driver-side parse +
    ``createDataFrame`` is the honest plan; bulk data arrives as
    CSV/parquet paths instead (S1). Chain ``to_long_form(df, value_col,
    process_col)`` for the engine's series model and ``upload_preview``
    for the reference's 5-row table."""
    import base64
    import io

    _, _, content_string = contents.partition(",")
    decoded = base64.b64decode(content_string)
    if "csv" in filename:
        import pandas as pd

        pdf = pd.read_csv(io.StringIO(decoded.decode(encoding)))
    elif "xls" in filename:
        try:
            import openpyxl  # noqa: F401

            import pandas as pd

            pdf = pd.read_excel(io.BytesIO(decoded))
        except ImportError:
            pdf = _read_xlsx_stdlib(io.BytesIO(decoded))
    else:
        raise ValueError(
            f"unsupported upload {filename!r}: expected a csv or xls file "
            "(the reference's parse_contents routes on the same substrings)"
        )
    return spark.createDataFrame(pdf)


def upload_preview(df: DataFrame, n: int = 5) -> DataFrame:
    """The reference's upload preview (first 5 rows as a table,
    app.py:1633-1637) — ``limit`` keeps it a driver-safe O(n) plan at
    any upload size."""
    return df.limit(n)


def read_timeseries_excel(
    spark: SparkSession,
    path: str,
    value_col: str,
    process_col: str | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    """Excel ingest (reference S2 xls branch, app.py:1620-1625: driver-
    side ``pd.read_excel``). Excel files are small by construction
    (single-file uploads), so a driver-side parse + createDataFrame is
    the honest scale story; big data arrives as CSV/parquet instead.

    Uses pandas/openpyxl when installed; otherwise falls back to the
    vendor-free stdlib parser below (xlsx IS a zip of XML — zipfile +
    ElementTree cover the cell types an upload needs: shared strings,
    inline strings, numbers, booleans, formula caches)."""
    try:
        import openpyxl  # noqa: F401

        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:
        pdf = _read_xlsx_stdlib(path, sheet_name)
    return to_long_form(spark.createDataFrame(pdf), value_col, process_col)


def _read_xlsx_stdlib(path: str, sheet_name: int | str = 0):
    """Minimal xlsx reader on the stdlib only (zipfile + ElementTree).

    Parses sharedStrings, resolves the sheet through the workbook
    relationships, and materializes a pandas DataFrame with row 1 as
    the header — the subset of pd.read_excel an upload-shaped file
    exercises. Styles, dates-as-serials, merged cells, and formulas
    (beyond their cached values) are out of scope.
    """
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    import pandas as pd

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {r.get("Id"): r.get("Target") for r in rels}
        sheets = [
            (sh.get("name"), rid_to_target[sh.get(f"{RNS}id")])
            for sh in wb.find(f"{NS}sheets")
        ]
        if isinstance(sheet_name, int):
            target = sheets[sheet_name][1]
        else:
            target = dict(sheets)[sheet_name]
        # absolute part names ('/xl/worksheets/sheet1.xml') are legal in
        # OPC relationships: strip the leading slash FIRST, then only
        # prefix when the part is workbook-relative
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        ws = ET.fromstring(z.read(target))

        rows: list[dict[int, object]] = []
        for row in ws.iter(f"{NS}row"):
            cells: dict[int, object] = {}
            next_ci = 0
            for c in row.findall(f"{NS}c"):
                ref = c.get("r")
                if ref:
                    letters = re.match(r"([A-Z]+)", ref).group(1)
                    ci = 0
                    for ch in letters:
                        ci = ci * 26 + (ord(ch) - 64)
                    ci -= 1
                else:  # cells without refs are sequential
                    ci = next_ci
                next_ci = ci + 1
                t = c.get("t")
                v = c.find(f"{NS}v")
                if t == "inlineStr":
                    is_el = c.find(f"{NS}is")
                    val = (
                        "".join(x.text or "" for x in is_el.iter(f"{NS}t"))
                        if is_el is not None
                        else None
                    )
                elif v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = bool(int(v.text))
                elif t in ("str", "e"):
                    # formula cache string / error cell (#DIV/0!, #N/A):
                    # surface the literal text, never a float crash
                    val = v.text
                else:
                    try:
                        val = float(v.text)
                    except ValueError as exc:
                        raise ValueError(
                            f"unparseable numeric cell {ref or ci} "
                            f"({v.text!r}) in {target}"
                        ) from exc
                cells[ci] = val
            rows.append(cells)

    if not rows:
        return pd.DataFrame()
    ncols = max(max(r.keys(), default=-1) for r in rows) + 1
    header = [str(rows[0].get(i, f"col{i}")) for i in range(ncols)]
    data = [[r.get(i) for i in range(ncols)] for r in rows[1:]]
    return pd.DataFrame(data, columns=header)
