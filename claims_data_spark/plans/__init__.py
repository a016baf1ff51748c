"""Parameterized plan builders (SURVEY.md §3): the reference generates
SQL text from R parameters; we generate Column expressions and
DataFrame plans from Python parameters and let Catalyst optimize."""
