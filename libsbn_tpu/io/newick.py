"""Newick and Nexus parsing.

A hand-written recursive-descent parser replacing the reference's bison/flex
grammar (/root/reference/src/parser.yy, scanner.ll, driver.cpp) with the same
observable behavior:

  * the first tree parsed assigns taxon numbers in order of appearance
    (parser.yy node rule); subsequent trees must use the same taxon set;
  * quoted labels ('...' or "...") are supported and dequoted in the final
    tag->taxon map;
  * BEAST-style ``[&...]`` metadata comments are skipped, both after labels
    and after the colon before a branch length;
  * Nexus files must have a ``translate`` block; taxa are numbered by the
    order of names in the translate block (driver.cpp ParseNexusFile);
  * anything before the first '(' on a tree line is ignored.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from ..core.topology import Topology
from ..utils import taxon_names

Tag = Tuple[int, int]

_TOKEN_RE = re.compile(
    r"""
    \s*(
      \(|\)|,|:|;
      | \[&[^\]]*\]                # BEAST metadata comment
      | '(?:[^'\\]|\\.)*'          # single-quoted label
      | "(?:[^"\\]|\\.)*"          # double-quoted label
      | [^\s()\[\],:;]+            # bare label / number
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> List[str]:
    tokens = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            raise ValueError(
                f"Cannot tokenize newick at {pos}: {s[pos:pos + 30]!r}"
            )
        tok = m.group(1)
        pos = m.end()
        if tok.startswith("[&"):
            continue  # skip metadata comments
        tokens.append(tok)
    return tokens


class NewickParser:
    """Stateful parser: taxa numbering persists across trees (Driver analog)."""

    def __init__(self):
        self.taxa: Dict[str, int] = {}
        self.taxa_complete = False

    def clear(self):
        self.taxa = {}
        self.taxa_complete = False

    # -- public API ---------------------------------------------------------
    def tag_taxon_map(self) -> Dict[Tag, str]:
        return {(num, 1): name for name, num in self.taxa.items()}

    # -- internals ----------------------------------------------------------
    def _peek(self) -> Optional[str]:
        return self._tokens[self._pos] if self._pos < len(self._tokens) else None

    def _next(self) -> str:
        tok = self._peek()
        if tok is None:
            raise ValueError("Unexpected end of newick input")
        self._pos += 1
        return tok

    def _expect(self, tok: str):
        got = self._next()
        if got != tok:
            raise ValueError(f"Expected {tok!r}, got {got!r}")

    def _parse_fancy_node(self, branch_lengths: Dict[Tag, float]) -> Topology:
        node = self._parse_node()
        if self._peek() == ":":
            self._next()
            bl_tok = self._next()
            try:
                bl = float(bl_tok)
            except ValueError:
                raise ValueError(f"Float conversion failed on branch length {bl_tok!r}")
            tag = node.tag
            if tag in branch_lengths:
                raise ValueError(f"Duplicate tag {tag} in branch length map")
            branch_lengths[tag] = bl
        return node

    def _parse_node(self) -> Topology:
        if self._peek() == "(":
            self._next()
            children = [self._parse_fancy_node(self._current_bl_map)]
            while self._peek() == ",":
                self._next()
                children.append(self._parse_fancy_node(self._current_bl_map))
            self._expect(")")
            # An internal node may carry a label (ignored) — e.g. support values.
            if self._peek() not in ("(", ")", ",", ":", ";", None):
                self._next()
            return Topology.join(children)
        # leaf
        name_tok = self._next()
        if name_tok in ("(", ")", ",", ":", ";"):
            raise ValueError(f"Unexpected token {name_tok!r} where label expected")
        name = name_tok
        if not self.taxa_complete:
            if name not in self.taxa:
                self.taxa[name] = len(self.taxa)
            leaf_id = self.taxa[name]
        else:
            if name not in self.taxa:
                raise ValueError(
                    f"Taxon {name!r} is not known in our taxon set. Either it is "
                    "missing in the translate block or it didn't appear in the "
                    "first tree."
                )
            leaf_id = self.taxa[name]
        return Topology.leaf(leaf_id)

    # The branch-length dict for the tree currently being parsed. We route it
    # through an attribute so _parse_node's recursion into _parse_fancy_node
    # shares one map per tree.
    @property
    def _current_bl_map(self):
        return self._bl_map

    def parse_tree(self, s: str):
        """Entry point used by parse_* wrappers: one tree per call."""
        tokens = _tokenize(s)
        self._tokens = tokens
        self._pos = 0
        self._bl_map = {}
        top = self._parse_fancy_node(self._bl_map)
        self._expect(";")
        self.taxa_complete = True
        tag_id_map = top.polish()
        bl = [0.0] * (top.id + 1)
        for tag, idx in tag_id_map.items():
            bl[idx] = self._bl_map.get(tag, 0.0)
        return top, bl


def _from_native(parsed):
    """Build (topologies, branch_lengths, tag_taxon_map) from native arrays."""
    parent_vectors, bls, names = parsed
    tops = [
        Topology.of_parent_id_vector(list(pv)) for pv in parent_vectors
    ]
    ttm = {(i, 1): name for i, name in enumerate(names)}
    return tops, [b for b in bls], ttm


def parse_newick_string(s: str):
    """Parse a single newick string; returns (topologies, branch_lengths,
    tag_taxon_map)."""
    parser = NewickParser()
    tops, bls = [], []
    for line in s.strip().splitlines():
        start = line.find("(")
        if start < 0:
            continue
        top, bl = parser.parse_tree(line[start:])
        tops.append(top)
        bls.append(bl)
    return tops, bls, taxon_names.dequote_tag_string_map(parser.tag_taxon_map())


def parse_newick_file(path: str):
    from . import native

    parsed = native.parse_tree_file(path, nexus=False)
    if parsed is not None:
        return _from_native(parsed)
    with open(path) as f:
        return parse_newick_string(f.read())


def parse_nexus_file(path: str):
    """Parse a Nexus file with a translate block (driver.cpp ParseNexusFile).

    Returns (topologies, branch_lengths, tag_taxon_map) where taxa are
    numbered by translate-block order and the tag_taxon_map holds long names.
    """
    from . import native

    parsed = native.parse_tree_file(path, nexus=True)
    if parsed is not None:
        return _from_native(parsed)
    with open(path) as f:
        lines = f.read().splitlines()
    if not lines or lines[0].strip() != "#NEXUS":
        raise ValueError("Putative Nexus file doesn't begin with #NEXUS.")
    i = 1
    while i < len(lines) and lines[i].strip().lower() != "begin trees;":
        i += 1
    if i >= len(lines):
        raise ValueError("Finished reading and couldn't find 'begin trees;'")
    i += 1
    if not re.match(r"^\s*translate", lines[i], re.IGNORECASE):
        raise ValueError("Missing translate block.")
    i += 1
    item_re = re.compile(r"^\s*(\S+)\s([^,;]*)[,;]?$")
    lone_semicolon_re = re.compile(r"\s*;$")
    parser = NewickParser()
    long_names: Dict[Tag, str] = {}
    leaf_id = 0
    while i < len(lines):
        line = lines[i]
        m = item_re.match(line)
        if not m:
            if lone_semicolon_re.match(line):
                i += 1
            break
        short_name, long_name = m.group(1), m.group(2)
        parser.taxa[short_name] = leaf_id
        long_names[(leaf_id, 1)] = long_name
        leaf_id += 1
        if line.rstrip().endswith(";"):
            i += 1
            break
        i += 1
    if leaf_id == 0:
        raise ValueError("No taxa found in translate block!")
    parser.taxa_complete = True
    tops, bls = [], []
    for line in lines[i:]:
        start = line.find("(")
        if start >= 0:
            top, bl = parser.parse_tree(line[start:])
            tops.append(top)
            bls.append(bl)
    return tops, bls, taxon_names.dequote_tag_string_map(long_names)
