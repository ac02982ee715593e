"""Encoding repair: the classic UTF-8-as-cp1252 mojibake fix.

Crawled corpora are full of double-encoding damage — UTF-8 bytes
mis-decoded as cp1252 once ("…" → "â€¦", "’" → "â€™", "é" → "Ã©") — and
CCNet-style pipelines repair it before any quality scoring (a mojibake
document tokenizes into garbage and fails length/fluency filters it
should pass). ftfy is the reference single-machine tool; the subset that
matters at corpus scale is a FIXED substitution chain, derived here from
first principles: for each target character, the corrupted form is its
UTF-8 bytes decoded as cp1252 (so the table can't drift from the
encoding standards it models).

The repair is chained LITERAL ``replace`` calls — not regex, so there is
no escaping/flavor semantics to match across engines — in one codegen
projection: no shuffle, no Python, replayable verbatim in any engine
with the same chain (the conformance oracle is generated from this very
table).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: repair targets, longest corrupted form first (every 3-byte UTF-8
#: sequence beats its 2-byte prefixes). Only characters whose UTF-8
#: bytes are all defined in cp1252 belong here — e.g. U+201D ("”",
#: ...E2 80 9D) is excluded because 0x9D has no cp1252 mapping, so that
#: corruption never round-trips through a cp1252 decode in the first
#: place.
_REPAIR_TARGETS = ["…", "’", "‘", "“", "—", "–", "é", "è", "ü", "ö", "ä", "ç", "\u00a0"]


def _mojibake(good: str) -> str:
    return good.encode("utf-8").decode("cp1252")


#: (corrupted, repaired) pairs in application order — data, not code, so
#: oracles and sister pipelines replay the identical chain.
MOJIBAKE_CHAIN: list[tuple[str, str]] = [
    (_mojibake(g), g) for g in _REPAIR_TARGETS
]


def fix_encoding(text: Column | str) -> Column:
    """Repair UTF-8-as-cp1252 mojibake via the chained literal
    ``MOJIBAKE_CHAIN`` replacements (single codegen projection)."""
    c = F.col(text) if isinstance(text, str) else text
    for bad, good in MOJIBAKE_CHAIN:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


def corrupt_encoding(text: Column | str) -> Column:
    """The inverse damage (repaired → mojibake), applied in reverse
    chain order — the deterministic corruption seeder the conformance
    gate uses to exercise the repair on fixture text that is clean."""
    c = F.col(text) if isinstance(text, str) else text
    for bad, good in reversed(MOJIBAKE_CHAIN):
        c = F.replace(c, F.lit(good), F.lit(bad))
    return c


#: deterministic seed appended to fixture text by the conformance gate —
#: contains every repair target so every chain entry genuinely fires.
ENCODING_SEED = " café — “quote…’ ‘x’ ärgerlich ça über öl è" + " end"
