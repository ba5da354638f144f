"""Value cleaning and casting expressions.

Re-expresses the reference's pandas cleanup idioms as Catalyst
expressions (reference: pipelines/utils/utils.py:516-539
``clean_dataframe`` null-byte/"None" cleanup;
pipelines/rj_smtr/utils.py:325-332 ``safe_cast``;
pipelines/rj_cor/comando/eventos/tasks.py:203-247 recode/capitalize/
unidecode/fill; pipelines/rj_smtr/tasks.py:1456-1458 strip-all).
Everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Characters with combining accents common in pt-BR data and their
#: ascii base; used by strip_accents_expr via translate (JVM-side,
#: no UDF). Covers the Latin-1 range the reference's unidecode calls
#: actually see.
_ACCENTED = "áàâãäéèêëíìîïóòôõöúùûüçÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇñÑ"
_PLAIN = "aaaaaeeeeiiiiooooouuuucAAAAAEEEEIIIIOOOOOUUUUCnN"


def strip_accents_expr(col: Column | str) -> Column:
    """Accent-strip string values (unidecode equivalent for Latin-1)."""
    return F.translate(F.col(col) if isinstance(col, str) else col, _ACCENTED, _PLAIN)


def clean_string_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Null-byte removal and literal-"None"/empty → NULL on string cols."""
    columns = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    exprs = {}
    for c in columns:
        cleaned = F.regexp_replace(F.col(c), "\x00", "")
        exprs[c] = F.when(F.trim(cleaned).isin("None", ""), None).otherwise(cleaned)
    return df.withColumns(exprs)


def trim_all_strings(df: DataFrame) -> DataFrame:
    """Trim whitespace on every string column."""
    return df.withColumns(
        {
            f.name: F.trim(F.col(f.name))
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        }
    )


def safe_cast(col: Column | str, dtype: str) -> Column:
    """BigQuery ``SAFE_CAST`` equivalent: invalid input → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def negative_to_null(col: Column | str) -> Column:
    """Sensor-value sanitization: negative readings → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < 0, F.lit(None)).otherwise(c)


def recode(col: Column | str, mapping: dict[str, str], default_keep: bool = True) -> Column:
    """Dict-based value recode (pandas ``.replace`` equivalent)."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for src, dst in mapping.items():
        cond = c == F.lit(src)
        expr = F.when(cond, F.lit(dst)) if expr is None else expr.when(cond, F.lit(dst))
    if expr is None:
        return c
    return expr.otherwise(c) if default_keep else expr
