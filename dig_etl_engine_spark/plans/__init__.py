"""Query planning: the sandpaper-style structured-query compiler (SURVEY
§2.8 Q1–Q13) — driver-side Python producing Column expressions; Catalyst
does the physical planning (§4: no custom rules needed)."""
