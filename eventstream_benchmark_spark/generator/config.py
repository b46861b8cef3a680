"""Generator configuration surface (Layer A).

Mirrors the reference's parameter vocabulary exactly — the three
``Literal`` enums (reference ``eventstream.py:22-24``), the
``generate_patterns`` signature (``eventstream.py:140-149``) and the 18
``EventStream`` constructor params (``eventstream.py:197-221``) — as
frozen dataclasses, plus the md5-of-config-string cache key scheme
(``eventstream.py:249-264``) reused for the parquet materialization
cache in :mod:`spark_gen`.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

JITTER_DISTS = ("none", "uniform", "gaussian", "laplace")
INTERVAL_DISTS = ("fixed", "poisson", "geometric", "uniform")
DENSITY_MODES = ("none", "sin")


@dataclass(frozen=True)
class PatternConfig:
    """Parameters of pattern-set generation (reference ``eventstream.py:140-149``)."""

    n_patterns: int
    pattern_length: int
    n_types: int
    gap_dist: str = "uniform"
    gap_base: int = 5
    gap_low: int | None = 2
    gap_high: int | None = 9
    seed: int = 137

    def __post_init__(self) -> None:
        if self.pattern_length < 2:
            raise ValueError("pattern_length must be >= 2")
        if self.gap_dist not in INTERVAL_DISTS:
            raise ValueError(f"unknown gap_dist {self.gap_dist!r}")


@dataclass(frozen=True)
class StreamConfig:
    """Parameters of stream synthesis (reference ``eventstream.py:197-221``)."""

    n_types: int
    total_events: int
    random_ratio: float
    seed: int = 123
    pattern_jitter: str = "uniform"
    pattern_jitter_amount: int = 0
    rand_interval_dist: str = "poisson"
    rand_interval_base: int = 5
    rand_interval_low: int | None = 2
    rand_interval_high: int | None = 9
    rand_jitter: str = "uniform"
    rand_jitter_amount: int = 1
    density_mode: str = "none"
    density_period: int = 10_000
    density_amp: float = 0.8
    density_base_rate: float = 1.0

    def __post_init__(self) -> None:
        if not 0.0 <= self.random_ratio <= 1.0:
            raise ValueError("random_ratio must be in [0, 1]")
        for field, allowed in (
            ("pattern_jitter", JITTER_DISTS),
            ("rand_jitter", JITTER_DISTS),
            ("rand_interval_dist", INTERVAL_DISTS),
            ("density_mode", DENSITY_MODES),
        ):
            if getattr(self, field) not in allowed:
                raise ValueError(f"unknown {field} {getattr(self, field)!r}")


def cache_key(pcfg: PatternConfig, scfg: StreamConfig) -> str:
    """md5[:10] of EVERY config field of both dataclasses — the same key
    scheme the reference uses for its pickle cache
    (``eventstream.py:254-264``), here keying a parquet path instead.

    Unlike the reference's key (which omits the pattern seed and gap
    parameters — a silent cache-collision bug we deliberately do NOT
    mirror), the key covers the full pattern config: two configs that
    generate different streams can never share a cache entry.
    Field-name prefixes keep pattern/stream fields unambiguous."""
    parts = "|".join(
        f"p.{name}={getattr(pcfg, name)!r}" for name in sorted(PatternConfig.__dataclass_fields__)
    ) + "|" + "|".join(
        f"s.{name}={getattr(scfg, name)!r}" for name in sorted(StreamConfig.__dataclass_fields__)
    )
    return hashlib.md5(parts.encode()).hexdigest()[:10]
