"""Training-data pipeline stages (dedup / text analysis / similarity /
multimodal plumbing) — the large-scale operators the reference lacks,
built Ray-Data-first (map_batches over Arrow, actor pools for stateful
stages, keyed shuffles for the wide steps)."""
