"""FASTA alignment reading (reference: /root/reference/src/alignment.cpp)."""

from __future__ import annotations

from typing import Dict


class Alignment:
    """A taxon -> sequence map with same-length validation."""

    def __init__(self, data: Dict[str, str]):
        self.data = dict(data)

    def sequence_count(self) -> int:
        return len(self.data)

    def length(self) -> int:
        if not self.data:
            raise ValueError("Must have sequences in an alignment to ask for a Length.")
        return len(next(iter(self.data.values())))

    def is_valid(self) -> bool:
        if not self.data:
            return False
        length = self.length()
        return all(len(s) == length for s in self.data.values())

    def at(self, taxon: str) -> str:
        if taxon not in self.data:
            raise KeyError(f"Taxon '{taxon}' not found in alignment.")
        return self.data[taxon]

    def __eq__(self, other) -> bool:
        return isinstance(other, Alignment) and self.data == other.data

    def extract_single_column(self, which_column: int) -> "Alignment":
        return Alignment(
            {t: s[which_column : which_column + 1] for t, s in self.data.items()}
        )

    @staticmethod
    def read_fasta(path: str) -> "Alignment":
        data: Dict[str, str] = {}
        taxon, chunks = None, []

        def flush():
            if taxon is not None:
                if taxon in data:
                    raise ValueError(f"Duplicate taxon {taxon!r} in FASTA")
                data[taxon] = "".join(chunks)

        with open(path) as f:
            for line in f:
                line = line.rstrip("\n").rstrip("\r")
                if not line:
                    continue
                if line.startswith(">"):
                    flush()
                    taxon = line[1:]
                    chunks = []
                else:
                    chunks.append(line)
        flush()
        aln = Alignment(data)
        if not aln.is_valid():
            raise ValueError("Sequences of the alignment are not all the same length.")
        return aln
