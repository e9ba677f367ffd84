"""Parser tests mirroring /root/reference/src/driver.hpp TEST_CASE("Driver")
plus alignment/site-pattern tests."""

import numpy as np

from libsbn_tpu.core.site_pattern import SitePattern, symbol_vector_of
from libsbn_tpu.io import newick
from libsbn_tpu.io.fasta import Alignment


def test_newick_roundtrip():
    newicks = [
        "(a:0,b:0,c:0,d:0):0;",
        "((b:0,a:0):0,c:0):0;",
        "((a:1.1,b:2):0.4,c:3):0;",
        "(x:0,(a:1.1,(b:2,(quack:0.1,duck:0):0):0):0,c:3):1.1;",
    ]
    for s in newicks:
        tops, bls, ttm = newick.parse_newick_string(s)
        out = tops[0].newick(
            ["%g" % b for b in bls[0]], ttm
        )
        # Our writer uses %g formatting; compare against the same.
        assert out == s


def test_nexus_matches_newick(data_dir):
    nx = newick.parse_nexus_file(f"{data_dir}/DS1.subsampled_10.t.reordered")
    assert len(nx[0]) == 10
    nw = newick.parse_newick_file(f"{data_dir}/DS1.subsampled_10.t.nwk")
    assert nx[2] == nw[2]
    for t_nx, t_nw, b_nx, b_nw in zip(nx[0], nw[0], nx[1], nw[1]):
        assert t_nx == t_nw
        np.testing.assert_array_equal(b_nx, b_nw)


def test_five_taxon_names(data_dir):
    tops, bls, ttm = newick.parse_newick_file(f"{data_dir}/five_taxon_unrooted.nwk")
    names = [ttm[(i, 1)] for i in range(5)]
    assert names == ["x0", "x1", "x2", "x3", "x4"]


def test_beast_nexus(data_dir):
    tops, bls, ttm = newick.parse_nexus_file(f"{data_dir}/test_beast_tree_parsing.nexus")
    beast_taxa = [
        "aDuckA_1976", "aDuckB_1977", "aItaly_1987", "aMallard_1985",
        "hCHR_1983", "hCambr_1939", "hFortMon_1947", "hKiev_1979",
        "hLenin_1954", "hMongol_1985", "hMongol_1991", "hNWS_1933",
        "hPR_1934", "hSCar_1918.00", "hScot_1994", "hSuita_1989",
        "hUSSR_1977", "sEhime_1980", "sIllino_1963", "sIowa_1930",
        "sNebrask_1992", "sNewJers_1976", "sStHya_1991", "sWiscons_1961",
        "sWiscons_1.998e3",
    ]
    assert [ttm[(i, 1)] for i in range(25)] == beast_taxa
    for top in tops:
        assert top.leaf_count == len(beast_taxa)


def test_alignment(data_dir):
    aln = Alignment.read_fasta(f"{data_dir}/hello.fasta")
    assert aln.data == {
        "mars": "CCGAG-AGCAGCAATGGAT-GAGGCATGGCG",
        "saturn": "GCGCGCAGCTGCTGTAGATGGAGGCATGACG",
        "jupiter": "GCGCGCAGCAGCTGTGGATGGAAGGATGACG",
    }
    assert aln.is_valid()


def test_symbol_table():
    assert symbol_vector_of("-tgcaTGCA?") == [4, 3, 2, 1, 0, 3, 2, 1, 0, 4]


def test_site_pattern_weights():
    sp = SitePattern.hello()
    assert sp.pattern_count() == 15
    assert sp.weights.sum() == 31.0
    tp = sp.tip_partials()
    assert tp.shape == (3, 4, 15)
    # Gap columns give uniform tip partials.
    assert set(np.unique(tp)) <= {0.0, 1.0}


def test_taxon_name_quoting_goldens():
    """QuoteString/DequoteString round trips (taxon_name_munging.hpp
    TEST_CASE, incl. the mixed-quote raw-string cases)."""
    from libsbn_tpu.utils import taxon_names as tn

    unquoted = "hello 'there\" friend"
    double_quoted = '"this is a \\" test"'
    double_dequoted = 'this is a " test'
    single_quoted = "'this is a \\' test'"
    single_dequoted = "this is a ' test"

    assert tn.quote_string(unquoted) == '"hello \'there\\" friend"'
    assert tn.dequote_string(double_quoted) == double_dequoted
    assert tn.dequote_string(single_quoted) == single_dequoted
    assert tn.dequote_string(tn.quote_string(unquoted)) == unquoted

    test_map = {(2, 1): unquoted, (3, 1): double_quoted, (5, 1): single_quoted}
    expected = {(2, 1): unquoted, (3, 1): double_dequoted,
                (5, 1): single_dequoted}
    assert tn.dequote_tag_string_map(test_map) == expected


def test_tag_ordering_matches_intpack():
    """The reference packs (leaf_max, count) into a uint64 so the first int
    dominates sorting (intpack.hpp TEST_CASE); our tags are Python tuples,
    whose lexicographic order has the same property."""
    assert (0, 4) < (1, 0)
    assert (3, 4) < (2**32 - 1, 4)
    assert sorted([(1, 0), (0, 4), (0, 1)]) == [(0, 1), (0, 4), (1, 0)]
