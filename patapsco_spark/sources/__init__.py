"""Source connectors: web-pages table synthesis/extraction, patapsco
jsonl/TSV/SGML readers, qrels and run-file readers."""
