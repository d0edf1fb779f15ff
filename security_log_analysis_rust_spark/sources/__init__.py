"""Sources: log files (glob/gzip), journald JSONL, JSON import/export."""
