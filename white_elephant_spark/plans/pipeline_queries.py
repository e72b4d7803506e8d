"""White-Elephant pipeline-semantics queries (parsing, entity merge,
excess labeling, hour-explode proration). Populated operator by
operator; see white_elephant_spark/operators/."""

from __future__ import annotations
