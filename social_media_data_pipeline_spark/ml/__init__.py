"""Model-inference harness: pluggable models behind deterministic offline
stubs (tests never touch network/GPU — SURVEY.md §7.0 design stance)."""
