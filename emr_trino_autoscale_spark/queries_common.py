"""Constants shared by the query builders (queries.py) and their
DuckDB oracle SQL strings (queries_sql.py).

Split out in round 9 (VERDICT r8 task 8) so the oracle strings could
move to their own module without a circular import: builders write
signature parquet to the _Q*_PATHs that the oracle f-strings embed,
and the literal LSH/JL hyperplanes must be the SAME objects on both
sides (the md5-derived planes convention — DuckDB has no xxhash64, so
every oracle-replayed hash is md5-derived; see queries.py docstring).
"""

from __future__ import annotations

from .operators import similarity

import os as _os

_PLANES = similarity.md5_sign_planes(n_planes=8, dim=64)

_PACK_BUDGET = 2000

_PLANES24 = similarity.md5_sign_planes(n_planes=24, dim=64)

_PLANES_JL = similarity.md5_sign_planes(n_planes=16, dim=64)

_Q103_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q103_media_sigs",
)

_Q122_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q122_media_phash_sigs",
)

_Q123_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q123_media_afp_sigs",
)

_Q169_PROF_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q169_audio_profiles",
)

_Q184_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q184_media_dhash",
)

_Q194_SRC = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q194_raw_jsonl",
)

_Q194_DEST = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q194_landing",
)
