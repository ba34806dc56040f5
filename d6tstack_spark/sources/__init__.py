"""Sources: CSV dialect sniffing + readers (reference sniffer.py re-expressed)."""
