"""SemVer parsing, bumping, and version selectors.

ref: dc43-core/src/dc43_core/versioning.py:14-73 (parse/bump) and
dc43-integrations spark/io/validation.py:54-127 (``==x.y.z``, ``>=x.y.z``,
``latest`` selector resolution).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import total_ordering
from typing import Iterable, Optional

_SEMVER_RE = re.compile(
    r"^(?P<major>\d+)\.(?P<minor>\d+)\.(?P<patch>\d+)"
    r"(?:-(?P<prerelease>[0-9A-Za-z.-]+))?"
    r"(?:\+(?P<build>[0-9A-Za-z.-]+))?$"
)


@total_ordering
@dataclass(frozen=True)
class SemVer:
    major: int
    minor: int
    patch: int
    prerelease: Optional[str] = None
    build: Optional[str] = None

    @classmethod
    def parse(cls, text: str) -> "SemVer":
        m = _SEMVER_RE.match(text.strip())
        if not m:
            raise ValueError(f"invalid semantic version: {text!r}")
        return cls(
            int(m.group("major")),
            int(m.group("minor")),
            int(m.group("patch")),
            m.group("prerelease"),
            m.group("build"),
        )

    def bump(self, part: str) -> "SemVer":
        if part == "major":
            return SemVer(self.major + 1, 0, 0)
        if part == "minor":
            return SemVer(self.major, self.minor + 1, 0)
        if part == "patch":
            return SemVer(self.major, self.minor, self.patch + 1)
        raise ValueError(f"unknown bump part: {part!r}")

    def _cmp_key(self):
        # prerelease sorts BEFORE the release; numeric identifiers compare
        # numerically and rank below alphanumeric ones (semver.org §11)
        if self.prerelease is None:
            pre_key: tuple = (1, ())
        else:
            # the trailing raw string keeps the order TOTAL even on
            # spec-invalid numerics with leading zeros ('0' vs '00', which
            # tie as ints but are distinct identifiers)
            ids = tuple(
                (0, int(p), p) if p.isdigit() else (1, 0, p)
                for p in self.prerelease.split(".")
            )
            pre_key = (0, ids)
        return (self.major, self.minor, self.patch, pre_key)

    def __lt__(self, other: "SemVer") -> bool:
        return self._cmp_key() < other._cmp_key()

    def __str__(self) -> str:
        s = f"{self.major}.{self.minor}.{self.patch}"
        if self.prerelease:
            s += f"-{self.prerelease}"
        if self.build:
            s += f"+{self.build}"
        return s


def is_semver(text: str) -> bool:
    return _SEMVER_RE.match(text.strip()) is not None


def select_version(
    available: Iterable[str],
    selector: str = "latest",
    *,
    include_prerelease: bool = False,
) -> Optional[str]:
    """Resolve a version selector against available versions.

    ``==x.y.z`` exact; ``>=x.y.z`` newest satisfying; ``latest`` newest
    release (prereleases/drafts excluded unless ``include_prerelease``);
    a bare ``x.y.z`` behaves like ``==``.
    """
    versions = [(SemVer.parse(v), v) for v in available if is_semver(v)]
    if not versions:
        return None
    sel = selector.strip()
    if sel.startswith("=="):
        target = sel[2:].strip()
        return next((raw for _, raw in versions if raw == target), None)
    if sel.startswith(">="):
        floor = SemVer.parse(sel[2:].strip())
        candidates = [
            (p, raw)
            for p, raw in versions
            if p >= floor and (include_prerelease or p.prerelease is None)
        ]
        return max(candidates)[1] if candidates else None
    if sel == "latest":
        candidates = [
            (p, raw) for p, raw in versions if include_prerelease or p.prerelease is None
        ]
        return max(candidates)[1] if candidates else None
    # bare version == exact
    return next((raw for _, raw in versions if raw == sel), None)
