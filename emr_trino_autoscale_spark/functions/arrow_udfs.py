"""Arrow scalar pandas UDFs (the sanctioned Python slow path: Series in,
Series out, one Arrow batch at a time — never row-at-a-time).

NOTE: no ``from __future__ import annotations`` here — pandas_udf reads
the *evaluated* type hints to infer the UDF kind; stringized annotations
break the inference.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def vowel_count(s: pd.Series) -> pd.Series:
    """Vectorized vowel count per string (oracle-replayable: equals
    length(regexp_replace(lower(text), '[^aeiou]', '', 'g')))."""
    return s.str.lower().str.count(r"[aeiou]").astype("int64")
