"""Analytics: the reference's exploratory-analysis surface as DataFrame-
returning functions (plots are a presentation layer; aggregates are the
tested contract — `plotting.py:190`, `ExploratoryAnalysis.py:89`)."""
