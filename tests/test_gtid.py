"""GTID set parse/merge/contains/subtract — MySQL and MariaDB forms.
Reference parity: /root/reference/Bristol/mysql/mysql_gtid.go,
mariadb_gtid.go (their *_test.go cases shape these)."""

import pytest

from bifrost_spark.gtid import GtidSet, MariadbGtidSet

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
U2 = "6fa7e6ef-c49e-11e9-bfbf-0242ac110002"


def test_parse_normalize_roundtrip():
    g = GtidSet.parse(f"{U1}:1-5:7:9-12,{U2}:3")
    assert str(g) == f"{U1}:1-5:7:9-12,{U2}:3"
    # adjacent/overlapping intervals merge
    g2 = GtidSet.parse(f"{U1}:1-5:6-8:8-10")
    assert str(g2) == f"{U1}:1-10"


def test_union_and_add():
    a = GtidSet.parse(f"{U1}:1-100")
    b = GtidSet.parse(f"{U1}:90-150,{U2}:1-5")
    assert str(a.union(b)) == f"{U1}:1-150,{U2}:1-5"
    assert str(a.add(f"{U1}:101")) == f"{U1}:1-101"
    assert str(a.add(f"{U2}:7")) == f"{U1}:1-100,{U2}:7"


def test_contains():
    g = GtidSet.parse(f"{U1}:1-100:200-300")
    assert g.contains(f"{U1}:50")
    assert g.contains(f"{U1}:200-250")
    assert not g.contains(f"{U1}:150")
    assert not g.contains(f"{U1}:250-350")
    assert not g.contains(f"{U2}:1")
    assert g.contains(GtidSet.parse(f"{U1}:1-10:290-300"))


def test_subtract_resume_gap():
    source = GtidSet.parse(f"{U1}:1-1000,{U2}:1-50")
    applied = GtidSet.parse(f"{U1}:1-400:500-900,{U2}:1-50")
    gap = source.subtract(applied)
    assert str(gap) == f"{U1}:401-499:901-1000"
    assert source.subtract(source).sets == {}


def test_malformed_raises():
    with pytest.raises(ValueError):
        GtidSet.parse(f"{U1}")
    with pytest.raises(ValueError):
        GtidSet.parse(f"{U1}:9-3")


def test_mariadb_domains_merge_by_max_seq():
    a = MariadbGtidSet.parse("0-1-100,1-2-50")
    b = MariadbGtidSet.parse("0-3-120,2-1-7")
    u = a.union(b)
    assert str(u) == "0-3-120,1-2-50,2-1-7"
    assert u.contains("0-1-110")
    assert not u.contains("0-1-121")
    assert not u.contains("3-1-1")
    # within one parse, later higher seq wins per domain
    assert str(MariadbGtidSet.parse("0-1-5,0-2-9")) == "0-2-9"


def test_compact_bounds_interval_count():
    g = GtidSet({U1: [[i * 10, i * 10 + 4] for i in range(300)]})
    c = g.compact(max_intervals_per_uuid=16)
    assert len(c.sets[U1]) == 16
    # everything originally contained is still contained (bridging only adds)
    assert c.contains(g)
