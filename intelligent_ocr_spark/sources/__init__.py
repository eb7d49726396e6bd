"""Sources: synthetic Common-Crawl-style page generator + table IO."""
