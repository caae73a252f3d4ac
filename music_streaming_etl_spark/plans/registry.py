"""The composed query registry: core reference-surface queries +
extension ops + deeper analytics, one dict for ``__spark_entry__``.

Importing THIS module (never the sub-registries' merge side effects)
keeps the module graph acyclic: each query module only imports
helpers, and composition happens here.
"""

from __future__ import annotations

from .analytics_queries import REGISTRY_ANALYTICS
from .extension_queries import REGISTRY_EXT
from .testdata_queries import REGISTRY as REGISTRY_CORE
from .tpch_queries import REGISTRY_TPCH

REGISTRY: dict = {}
REGISTRY.update(REGISTRY_CORE)
REGISTRY.update(REGISTRY_EXT)
REGISTRY.update(REGISTRY_ANALYTICS)
REGISTRY.update(REGISTRY_TPCH)
