"""Shim: fixtures moved into the package (goskyr_spark/fixtures_html.py)
so production queries never depend on the test tree."""

from goskyr_spark.fixtures_html import *  # noqa: F401,F403
from goskyr_spark.fixtures_html import MOCK_PAGE, MOCK_CONFIG  # noqa: F401
