"""Bitset algebra tests, mirroring the reference doctest cases
(/root/reference/src/bitset.hpp TEST_CASE("Bitset"))."""

from libsbn_tpu.utils.bitset import Bitset, remap

B = Bitset.of_string


def test_basic_ops():
    a = B("1100")
    assert a[2] is False
    assert a[1] is True

    build_up = Bitset(4).set(1).set(3)
    assert build_up == B("0101")

    strip_down = Bitset.full(4).reset(0).reset(2)
    assert strip_down == B("0101")

    assert len(a) == 4
    assert B("1100") == B("1100")
    assert B("1100") != B("0100")

    assert B("0100") < B("0110")
    assert B("0010") < B("0100")
    assert B("0010") <= B("0100")
    assert B("1100") <= B("1100")
    assert B("0110") > B("0100")
    assert B("0100") > B("0010")
    assert B("0100") >= B("0010")
    assert B("1100") >= B("1100")

    assert (B("1100") & B("1010")) == B("1000")
    assert (B("1100") | B("1010")) == B("1110")
    assert (B("1100") ^ B("1010")) == B("0110")
    assert ~B("1010") == B("0101")
    assert B("101") + B("011") == B("101011")
    assert min(B("1100"), B("1010")) == B("1010")

    a = B("1100") & B("0110")
    assert a == B("0100")

    assert a.all() is False
    assert Bitset.full(4).all() is True
    assert a.any() is True
    assert not Bitset(4).any()


def test_flip_minorize_copy():
    a = B("0100")
    a = ~a
    assert a == B("1011")
    a = a.minorize()
    assert a == B("0100")
    assert a.minorize() == B("0100")

    a = a.copy_from(B("10"), 0, False)
    assert a == B("1000")
    a = a.copy_from(B("10"), 0, True)
    assert a == B("0100")
    a = a.copy_from(B("10"), 2, False)
    assert a == B("0110")
    a = a.copy_from(B("10"), 2, True)
    assert a == B("0101")


def test_singleton_count_indexset():
    singleton = B("0010")
    assert singleton.is_singleton()
    assert singleton.singleton_option() == 2

    assert B("0000").count() == 0
    assert B("0100").count() == 1
    assert B("011101").count() == 4

    assert B("1001").to_index_set_string() == "0,3"
    assert B("0000").to_index_set_string() == ""


def test_subsplit_and_pcsp_chunks():
    p = B("000111")
    assert p.subsplit_chunk(0) == B("000")
    assert p.subsplit_chunk(1) == B("111")
    assert p.pcsp_chunk(0) == B("00")
    assert p.pcsp_chunk(1) == B("01")
    assert p.pcsp_chunk(2) == B("11")

    assert B("10011100").rotate_subsplit() == B("11001001")
    assert B("010101").subsplit_to_index_set_string() == "1|0,2"


def test_pcsp_validity():
    assert B("011101").pcsp_is_valid() is False
    assert B("000111").pcsp_is_valid() is False
    assert B("100100").pcsp_is_valid() is False
    assert B("100011001").pcsp_is_valid() is True

    assert B("100011001").pcsp_is_fake() is False
    assert B("100011000").pcsp_is_fake() is True

    assert B("100011001").pcsp_parent() == B("100011")
    assert B("100011001").pcsp_without_parent() == B("011001")
    assert B("100011001").pcsp_child_subsplit() == B("010001")
    assert B("100001110001").pcsp_child_subsplit() == B("01100001")
    assert B("100001110001").pcsp_child_subsplit_taxon_counts() == (1, 2)
    assert B("100000111100101").pcsp_child_subsplit_taxon_counts() == (2, 2)


def test_static_builders():
    import pytest

    assert Bitset.singleton(4, 2) == B("0010")

    assert Bitset.child_subsplit(B("00011110"), B("0100")) == B("10100100")
    assert Bitset.child_subsplit(B("00011110"), B("1010")) == B("01001010")

    assert B("000110010") == Bitset.pcsp_of_pair(B("000110"), B("010100"))
    assert B("001110010") == Bitset.pcsp_of_pair(B("001110"), B("100010"))
    with pytest.raises(ValueError):
        Bitset.pcsp_of_pair(B("000110"), B("000010"))
    with pytest.raises(ValueError):
        Bitset.pcsp_of_pair(B("000110"), B("100000"))
    with pytest.raises(ValueError):
        Bitset.pcsp_of_pair(B("000110"), B("100110"))
    with pytest.raises(ValueError):
        Bitset.pcsp_of_pair(B("000110"), B("100001"))

    assert B("010000").subsplit_is_fake() is True
    assert B("010010").subsplit_is_fake() is False
    assert B("").subsplit_is_fake() is True
    assert Bitset.fake_subsplit(B("010")) == B("010000")
    assert Bitset.fake_child_subsplit(B("100001")) == B("001000")
    with pytest.raises(ValueError):
        Bitset.fake_child_subsplit(B("100011"))
    assert Bitset.fake_pcsp(B("100001")) == B("100001000")
    with pytest.raises((ValueError, AssertionError)):
        Bitset.fake_pcsp(B("0000110"))
    with pytest.raises(ValueError):
        Bitset.fake_pcsp(B("100101"))


def test_remap():
    assert remap(B("10101010101"), [0, 2, 4, 6, 8, 10]) == B("111111")
    rotate120 = [6, 7, 8, 0, 1, 2, 3, 4, 5]
    to_rotate = B("110010100")
    assert (
        remap(remap(remap(to_rotate, rotate120), rotate120), rotate120) == to_rotate
    )
    assert remap(B("11"), [0, None, 1]) == B("101")
