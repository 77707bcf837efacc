"""8-bit logarithmic doc-length quantization.

The reference stores per-document field lengths as one byte using a
logarithmic code (``/root/reference/src/whoosh/util/numeric.py:330-644``):
the byte->length table is generated from ``int(round((1.033**n - 1) * 27))``
for n in 0..255, and ``length_to_byte`` is ``bisect_left`` into that table
(saturating at 106374 -> 255).  BM25's per-doc field length input is
``byte_to_length(length_to_byte(true_len))`` — tests in the reference
(``tests/test_quality.py:8-22``) confirm the quantization is intentional,
so the Spark engine must apply the same code or scores diverge.

We regenerate the table from the published formula rather than copying the
literal array.
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np

# byte -> representative length, generated from the reference's documented
# formula (numeric.py:353-356). Strictly increasing for n >= 1.
_B2L = np.array([int(round((1.033**n - 1) * 27)) for n in range(256)], dtype=np.int64)
_SATURATE = 106374  # numeric.py:636-639: lengths >= this code to 255

B2L_LIST: list[int] = [int(x) for x in _B2L]


def length_to_byte(length: int | None) -> int:
    """Scalar quantizer — mirrors numeric.py:635-641."""
    if length is None:
        return 0
    if length >= _SATURATE:
        return 255
    return bisect_left(B2L_LIST, length)


def byte_to_length(code: int) -> int:
    """Scalar dequantizer — mirrors numeric.py:644."""
    return int(_B2L[code])


def length_to_byte_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized quantizer for the Arrow/pandas build path.

    np.searchsorted(side='left') == bisect_left on a sorted table.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    codes = np.searchsorted(_B2L, lengths, side="left")
    return np.where(lengths >= _SATURATE, 255, codes).astype(np.int64)


def byte_to_length_np(codes: np.ndarray) -> np.ndarray:
    return _B2L[np.asarray(codes, dtype=np.int64)]


def quantized_length_np(lengths: np.ndarray) -> np.ndarray:
    """byte_to_length(length_to_byte(x)) — the value BM25 actually uses."""
    return _B2L[length_to_byte_np(lengths)]


# --- SQL fragments (for Spark SQL expressions and DuckDB oracle parity) ---

def b2l_array_sql() -> str:
    """The byte->length table as a SQL array literal (0-based code;
    engines index it 1-based via element_at/list_extract)."""
    return "array(" + ",".join(str(int(x)) for x in _B2L) + ")"


def quantized_len_sql(col: str, dialect: str = "spark") -> str:
    """SQL expression computing byte_to_length(length_to_byte(col)).

    bisect_left == count of table entries strictly less than the value
    (table is sorted, strictly increasing from index 1; index 0 holds 0 and
    only length<=0 maps there, which cannot occur for real docs).
    """
    arr = "[" + ",".join(str(int(x)) for x in _B2L) + "]"
    if dialect == "duckdb":
        code = (
            f"(CASE WHEN {col} >= {_SATURATE} THEN 255 ELSE "
            f"len(list_filter({arr}, _x -> _x < {col})) END)"
        )
        return f"list_extract({arr}, {code} + 1)"
    # spark: aggregate() to count entries < col
    code = (
        f"(CASE WHEN {col} >= {_SATURATE} THEN 255 ELSE "
        f"aggregate({b2l_array_sql()}, 0, (acc, _x) -> acc + IF(_x < {col}, 1, 0)) END)"
    )
    return f"element_at({b2l_array_sql()}, {code} + 1)"
