from __future__ import annotations

import pytest

from dc43_spark.contracts.versioning import SemVer, is_semver, select_version


def test_parse_and_str():
    v = SemVer.parse("1.2.3")
    assert (v.major, v.minor, v.patch) == (1, 2, 3)
    assert str(SemVer.parse("1.2.3-draft.1+b42")) == "1.2.3-draft.1+b42"
    with pytest.raises(ValueError):
        SemVer.parse("1.2")


def test_bump():
    v = SemVer.parse("1.2.3")
    assert str(v.bump("patch")) == "1.2.4"
    assert str(v.bump("minor")) == "1.3.0"
    assert str(v.bump("major")) == "2.0.0"


def test_ordering():
    assert SemVer.parse("1.2.3") < SemVer.parse("1.2.10")
    assert SemVer.parse("1.2.3-draft") < SemVer.parse("1.2.3")
    assert SemVer.parse("1.2.3-alpha.1") < SemVer.parse("1.2.3-alpha.2")
    assert SemVer.parse("1.2.3-1") < SemVer.parse("1.2.3-alpha")


def test_selectors():
    versions = ["0.1.0", "0.1.1", "1.0.0", "1.1.0-draft-x"]
    assert select_version(versions, "latest") == "1.0.0"
    assert select_version(versions, "latest", include_prerelease=True) == "1.1.0-draft-x"
    assert select_version(versions, "==0.1.1") == "0.1.1"
    assert select_version(versions, "==9.9.9") is None
    assert select_version(versions, ">=0.1.1") == "1.0.0"
    assert select_version(versions, ">=2.0.0") is None
    assert select_version(versions, "0.1.0") == "0.1.0"
    assert select_version([], "latest") is None
    assert is_semver("1.0.0") and not is_semver("latest")
