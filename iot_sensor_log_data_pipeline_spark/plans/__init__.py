"""Query catalog: the driver-facing inventory of engine capabilities.

Importing :mod:`.catalog` and calling :func:`.catalog.all_queries`
triggers registration of every query module.
"""
