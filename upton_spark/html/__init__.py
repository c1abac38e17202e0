"""Pure-Python HTML DOM + CSS/XPath-subset selector engine.

The extraction layer of the engine ("Just add CSS" — reference README.md:21,
Nokogiri calls at lib/upton.rb:281-288 and lib/upton/utils.rb:20-40)
implemented from scratch on the stdlib ``html.parser``, because lxml is not
available in this environment (SURVEY.md §7.5). Byte-identical text output
against the reference RSpec goldens is the correctness contract
(BASELINE.json north_star).

All of this is plain Python operating on one document at a time; the
Arrow-vectorized batch wrappers live in :mod:`upton_spark.functions.udfs`.
"""

from upton_spark.html.dom import Element, parse_html, decode_html_bytes  # noqa: F401
from upton_spark.html.selector import search, css_select, xpath_select  # noqa: F401
from upton_spark.html.extract import (  # noqa: F401
    text_of,
    node_set_text,
    extract_links,
    extract_text,
    extract_list,
    extract_table,
)
