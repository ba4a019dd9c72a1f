"""Global engine configuration — the counterpart of the reference's
``config/globalConfig.json`` (fields observed at
``config/globalConfig.json:1-8``: ``aws_account``, ``fm_prefix``,
``primary_region``, ``secondary_region``, ``log_type``,
``secret_name``).

The reference threads this dict into every Lambda to derive bucket
names (``{fm_prefix}-...``) and to look up the column-masking key
(``secret_name: "cape_privacy_key"``) from Secrets Manager.  Here:

- ``fm_prefix`` namespaces warehouse table directories
  (``Catalog(config=...)`` stores ``{fm_prefix}.{entity_type}``), so
  two frameworks can share one warehouse path without collision —
  the engine-side analogue of prefix-scoped bucket names;
- ``secret_name`` names the masking key for :func:`mask_column` —
  deterministic keyed masking (salted SHA-256), the engine-side
  analogue of the Cape-style column privacy the reference wires via
  ``cft/sourceSystem.yaml:23-26``;
- ``log_type`` / regions are carried for API parity and surfaced in
  :meth:`GlobalConfig.as_dict`; a single-cluster Spark deployment has
  no secondary region, so they are descriptive, not behavioral.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GlobalConfig:
    """Engine-wide settings; field names mirror the reference JSON."""

    account: str = "000000000000"
    fm_prefix: str = "dl-fmwrk"
    primary_region: str = "us-east-2"
    secondary_region: str = "us-east-1"
    log_type: str = "S"
    secret_name: str = "cape_privacy_key"

    @classmethod
    def load(cls, path: str) -> "GlobalConfig":
        """Load from a reference-shaped JSON file; unknown keys are
        ignored, missing keys keep their defaults."""
        with open(path) as f:
            raw = json.load(f)
        known = {
            "aws_account": "account",
            "account": "account",
            "fm_prefix": "fm_prefix",
            "primary_region": "primary_region",
            "secondary_region": "secondary_region",
            "log_type": "log_type",
            "secret_name": "secret_name",
        }
        kwargs = {known[k]: v for k, v in raw.items() if k in known}
        return cls(**kwargs)

    def as_dict(self) -> dict:
        return asdict(self)

    def table_name(self, entity_type: str) -> str:
        """Prefix-scoped table directory name, ``{fm_prefix}.{entity}``."""
        return f"{self.fm_prefix}.{entity_type}"

    def warehouse_path(self, base: str, entity_type: str) -> str:
        return os.path.join(base, self.table_name(entity_type))


def mask_column(col: Column, key_name: str) -> Column:
    """Deterministic keyed masking: SHA-256 of ``key_name || ':' ||
    value``.  The key NAME is the salt domain (the reference stores the
    actual key material in Secrets Manager under ``secret_name``; an
    engine run is configured with the name, and rotating the name
    rotates every mask).  Same value + same key → same mask, so masked
    columns remain joinable/groupable — the property that makes masked
    data usable in analytics, which plain randomization would destroy.

    Scale shape: pure JVM expression (concat + sha2), codegen-eligible,
    zero shuffle — a 100 TB masking pass is scan-bound."""
    return F.sha2(F.concat(F.lit(key_name), F.lit(":"), col.cast("string")), 256)
