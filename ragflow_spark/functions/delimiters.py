"""Delimiter-spec compilation.

Reference semantics (rag/nlp/__init__.py:701-717 ``get_delimiters``): a
delimiter spec is a string of single-character delimiters plus backtick-quoted
multi-character ones; compile to a longest-first alternation regex.
"""

from __future__ import annotations

import re
from functools import lru_cache


@lru_cache(maxsize=256)
def get_delimiters(delimiters: str) -> str:
    dels: list[str] = []
    s = 0
    for m in re.finditer(r"`([^`]+)`", delimiters):
        f, t = m.span()
        dels.append(m.group(1))
        dels.extend(list(delimiters[s:f]))
        s = t
    if s < len(delimiters):
        dels.extend(list(delimiters[s:]))
    dels = sorted((d for d in dels if d), key=lambda x: -len(x))
    return "|".join(re.escape(d) for d in dels)
