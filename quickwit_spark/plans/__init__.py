"""Planning layer: index config, metastore (split metadata +
checkpoints), query parser, split pruning, merge policy."""
