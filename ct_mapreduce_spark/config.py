"""Layered engine configuration, mirroring the reference's precedence:
flags < ini file < environment (config/config.go:149-214; test coverage
config/config_test.go:8-96).

The reference reads `~/.ct-fetch.ini` sections and `env` overrides for
knobs like numThreads, savePeriod, pollingDelay. Our equivalents are the
Spark confs set in session.py plus these engine-level knobs.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    # reference-parity knobs (defaults per config/config.go:183-213)
    cert_path: str | None = None  # certPath; None => noop sink (engine.go:24)
    num_threads: int = 1  # numThreads (config.go:187) -> shuffle partitions hint
    log_expired: bool = False  # logExpiredEntries (config.go:188)
    issuer_cn_filter: str = ""  # issuerCNFilter, comma-separated prefixes
    save_period: str = "15m"  # savePeriod (config.go:192) -> trigger cadence
    limit: int | None = None  # scan bound (config.go:184)
    offset: int | None = None  # scan start (config.go:185)
    statsd_host: str = ""  # statsdHost (config.go:200)
    statsd_port: int = 0  # statsdPort (config.go:201); enabled when > 1
    # engine knobs
    sf_dir: str = "/root/testdata/sf0.1"
    shuffle_partitions: int | None = None

    _ENV_PREFIX = "CTSPARK_"

    @property
    def cn_prefixes(self) -> list[str]:
        return [p for p in self.issuer_cn_filter.split(",") if p]


def load_config(
    flags: dict[str, object] | None = None,
    ini_path: str | None = None,
    env: dict[str, str] | None = None,
) -> EngineConfig:
    """Precedence: defaults < flags < ini < env (matching the layering of
    config.go:149-214 where later sources override earlier ones)."""
    cfg = EngineConfig()
    names = {f.name for f in fields(EngineConfig) if not f.name.startswith("_")}

    def apply(d: dict[str, object]) -> None:
        for k, v in d.items():
            if k not in names or v is None:
                continue
            cur = getattr(cfg, k)
            if isinstance(cur, bool) and isinstance(v, str):
                v = v.lower() in ("1", "true", "yes")
            elif isinstance(cur, int) and not isinstance(cur, bool) and isinstance(v, str):
                v = int(v)
            setattr(cfg, k, v)

    if flags:
        apply(flags)
    if ini_path and os.path.exists(ini_path):
        parser = configparser.ConfigParser()
        parser.read(ini_path)
        if parser.has_section("ctspark"):
            apply(dict(parser.items("ctspark")))
    env_src = env if env is not None else os.environ
    apply(
        {
            k[len(EngineConfig._ENV_PREFIX):].lower(): v
            for k, v in env_src.items()
            if k.startswith(EngineConfig._ENV_PREFIX)
        }
    )
    return cfg
