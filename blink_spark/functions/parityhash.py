"""The engine-portable sample hash shared by every md5 parity twin.

First 60 bits of md5(cast(id as string)) as a BIGINT — computable
identically in Spark (conv/substring/md5) and DuckDB
(('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT). SEEDLESS by
contract: the ANN parity oracles (`ann_ivf_parity`,
`ann_ivf_refined_parity`, `ann_pq_parity`) hard-code this exact form;
change it only in lock-step with every SQL twin. (The sampling module
uses a seed-folded variant — see functions/sampling._id_hash64.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_hash64(col_name: str) -> Column:
    return F.expr(
        f"cast(conv(substring(md5(cast({col_name} as string)), 1, 15), 16, 10) "
        f"as bigint)"
    )


def md5_pair_hash64(a_col: str, b_col: str) -> Column:
    """The pair-keyed variant (e.g. NN-descent's degree-cap order):
    first 60 bits of md5(a || '|' || b). DuckDB twin:
    ('0x' || substr(md5(a::VARCHAR || '|' || b::VARCHAR), 1, 15))::BIGINT."""
    return F.expr(
        f"cast(conv(substring(md5(concat_ws('|', cast({a_col} as string), "
        f"cast({b_col} as string))), 1, 15), 16, 10) as bigint)"
    )
