"""Sources: social-network activity ingest (pipe-format parser + the
deterministic fixture synthesizer over the driver testdata)."""
