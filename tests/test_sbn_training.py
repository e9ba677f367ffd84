"""SBN SA/EM training parity vs zcrabbit/sbn golden vectors
(unrooted_sbn_instance.hpp:336-357, sbn_probability.hpp) and the 20-taxon
rooted SA test (rooted_sbn_instance.hpp:234-244)."""

import csv

import numpy as np
import pytest

from libsbn_tpu import RootedInstance, UnrootedInstance

from golden_sbn import (
    EXPECTED_EM_0_1,
    EXPECTED_EM_0_23,
    EXPECTED_EM_05_100,
    EXPECTED_SA,
)


@pytest.fixture(scope="module")
def ds1_100(data_dir):
    inst = UnrootedInstance("charlie")
    inst.read_newick_file(f"{data_dir}/DS1.100_topologies.nwk")
    inst.process_loaded_trees()
    return inst


def test_simple_average(ds1_100):
    ds1_100.train_simple_average()
    probs = ds1_100.calculate_sbn_probabilities()
    np.testing.assert_allclose(probs, EXPECTED_SA, atol=1e-12)


def test_em_alpha0(ds1_100):
    ds1_100.train_expectation_maximization(0.0, 1)
    np.testing.assert_allclose(
        ds1_100.calculate_sbn_probabilities(), EXPECTED_EM_0_1, atol=1e-12
    )
    ds1_100.train_expectation_maximization(0.0, 23)
    np.testing.assert_allclose(
        ds1_100.calculate_sbn_probabilities(), EXPECTED_EM_0_23, atol=1e-12
    )


def test_em_alpha05(ds1_100):
    ds1_100.train_expectation_maximization(0.5, 100)
    np.testing.assert_allclose(
        ds1_100.calculate_sbn_probabilities(), EXPECTED_EM_05_100, atol=1e-5
    )


def test_rooted_simple_average_20_taxa(data_dir):
    inst = RootedInstance("rooted instance")
    inst.read_newick_file(f"{data_dir}/rooted_simple_average.nwk")
    inst.process_loaded_trees()
    inst.train_simple_average()
    correct = {}
    with open(f"{data_dir}/rooted_simple_average_results.csv") as f:
        for row in csv.reader(f):
            correct[row[0]] = float(row[1])
    for key, prob in inst.pretty_indexed_sbn_parameters():
        assert abs(prob - correct[key]) < 1e-6, key


def test_sbn_parameter_csv_roundtrip(ds1_100, tmp_path):
    ds1_100.train_simple_average()
    path = str(tmp_path / "params.csv")
    ds1_100.sbn_parameters_to_csv(path)
    before = ds1_100.calculate_sbn_probabilities()
    ds1_100.read_sbn_parameters_from_csv(path)
    after = ds1_100.calculate_sbn_probabilities()
    np.testing.assert_allclose(before, after, atol=1e-9)


def test_modifying_sbn_parameters(data_dir):
    """Partial parameter maps: missing keys -> log-zero
    (test_libsbn.py test via data/test_modifying_sbn_parameters.csv)."""
    inst = UnrootedInstance("charlie")
    inst.read_newick_file(f"{data_dir}/hello.nwk")
    inst.process_loaded_trees()
    inst.read_sbn_parameters_from_csv(
        f"{data_dir}/test_modifying_sbn_parameters.csv"
    )
    assert np.all(np.isfinite(inst.sbn_parameters) | (inst.sbn_parameters < -1e300))
