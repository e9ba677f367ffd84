"""Taxon name munging: quoting and date parsing.

Mirrors the behavior of /root/reference/src/taxon_name_munging.cpp: names may
be single- or double-quoted (with backslash escapes); dates are parsed from a
trailing ``_<number>`` suffix and made relative to the maximum date (so the
most recent tip has date 0 and dates increase into the past).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

Tag = Tuple[int, int]

_DATE_RE = re.compile(r"^.+_(\d*\.?\d+(?:[eE][-+]?\d+)?)$")


def quote_string(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def dequote_string(s: str) -> str:
    if not s:
        return s
    delim = s[0]
    if delim not in ("'", '"'):
        return s
    # std::quoted-style parsing: read until unescaped closing delimiter.
    out = []
    i = 1
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        elif c == delim:
            break
        else:
            out.append(c)
            i += 1
    return "".join(out)


def dequote_tag_string_map(m: Dict[Tag, str]) -> Dict[Tag, str]:
    return {tag: dequote_string(v) for tag, v in m.items()}


def make_dates_relative_to_maximum(tag_date_map: Dict[Tag, float]) -> Dict[Tag, float]:
    if not tag_date_map:
        return tag_date_map
    max_date = max(tag_date_map.values())
    return {tag: max_date - d for tag, d in tag_date_map.items()}


def constant_dates_for_tag_taxon_map(tag_taxon_map: Dict[Tag, str]) -> Dict[Tag, float]:
    return {tag: 0.0 for tag in tag_taxon_map}


def parse_dates_from_tag_taxon_map(tag_taxon_map: Dict[Tag, str]) -> Dict[Tag, float]:
    tag_date_map: Dict[Tag, float] = {}
    for tag, taxon in tag_taxon_map.items():
        m = _DATE_RE.match(taxon)
        if m is None:
            raise ValueError(f"Couldn't parse a date from: {taxon}")
        tag_date_map[tag] = float(m.group(1))
    return make_dates_relative_to_maximum(tag_date_map)
