"""DataFrame -> DataFrame transform library (SURVEY.md §2 A*/J*/T*/V*)."""
