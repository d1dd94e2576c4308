"""Example batch apps — the reference's pipelines/ entry points (SURVEY §3
E3: arg-parse -> session -> load -> compose -> fit -> evaluate -> report),
restated as python -m modules over the fixture tables."""
