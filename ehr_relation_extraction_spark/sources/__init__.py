"""Sources & sinks: pages-table builder, fixture readers, stage tables."""
