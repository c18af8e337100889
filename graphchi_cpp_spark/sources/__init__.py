"""Sources/sinks for the reference's text graph formats (SURVEY §2.2)."""
