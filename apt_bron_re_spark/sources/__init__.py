"""Sources & sinks: synthetic page corpus, stage-table I/O."""
