"""Sources & sinks (SURVEY.md §2.1) — connectors in datasource.py, write
path in sink.py."""
