"""Test/validation harness: golden-diff comparison, disorder-injecting
replay, and single-writer sinks — the engine-side equivalents of the
reference's scripts/ and Producer tooling."""

from .golden import golden_diff, assert_golden
from .replay import paced_replay, with_random_lateness

__all__ = ["golden_diff", "assert_golden", "paced_replay", "with_random_lateness"]
