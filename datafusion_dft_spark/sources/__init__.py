"""Sources & sinks: format-sniffed readers and suffix-inferred writers."""
