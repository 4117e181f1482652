"""Shared XML fixture corpus exercising all five block grammars, malformed
variants (F4/F5 paths), CJK tags, and CDATA history — per FIXTURES.md §1."""

TOOL_USE_SIMPLE = """Let me search.
<tool_use>
<tool_name>web_search</tool_name>
<parameter>
<query>spark window functions</query>
<max_results>5</max_results>
</parameter>
</tool_use>
Done."""

TOOL_USE_TRUNCATED = """<tool_use>
<tool_name>calculator</tool_name>
<parameter>
<expression>1+2</expression>
</parameter>"""  # missing </tool_use> — F4 restores

TOOL_USE_HTML_IN_PARAM = """<tool_use>
<tool_name>writer</tool_name>
<parameter>
<html_body>some <b>bold</b> text with <br> break</html_body>
</parameter>
</tool_use>"""

SUB_AGENT = """Delegating:
<sub-agent>
<agent_name>researcher</agent_name>
<message>Find recent OLAP papers</message>
</sub-agent>"""

PARALLEL_TOOLS = """<use_parallel_tool_calls>
<parallel_tool>
<tool_name>search_a</tool_name>
<parameter><q>alpha</q></parameter>
</parallel_tool>
<parallel_tool>
<tool_name>search_b</tool_name>
<parameter><q>beta</q></parameter>
</parallel_tool>
</use_parallel_tool_calls>"""

PARALLEL_SUB_AGENTS = """<use_parallel_sub_agents>
<parallel_agent>
<agent_name>alpha_agent</agent_name>
<message>do alpha</message>
</parallel_agent>
<parallel_agent>
<agent_name>beta_agent</agent_name>
<message>do beta</message>
</parallel_agent>
<parallel_tool>
<tool_name>gamma_tool</tool_name>
<parameter><x>1</x></parameter>
</parallel_tool>
</use_parallel_sub_agents>"""

BATCH_AGENT = """<use_batch_agent>
<agent_name>batcher</agent_name>
<input_data_source>
<file_name>items.jsonl</file_name>
<format>jsonl</format>
</input_data_source>
<message>Process {item} carefully</message>
</use_batch_agent>"""

CJK_TAGS = """<tool_use>
<tool_name>翻译工具</tool_name>
<parameter>
<文本>你好世界</文本>
</parameter>
</tool_use>"""

MALFORMED_UNBALANCED = """<tool_use>
<tool_name>broken</tool_name>
<parameter>
<a>1
</parameter>
</tool_use>"""

SUB_AGENT_WITH_HISTORY = """<sub-agent>
<agent_name>helper</agent_name>
<message>continue</message>
<history><![CDATA[user: hi
assistant: hello]]></history>
</sub-agent>"""

SUB_AGENT_BAD_HISTORY = """<sub-agent>
<agent_name>helper</agent_name>
<message>continue</message>
<history>user: hi</history>
</sub-agent>"""

PLAIN_TEXT = "Just a normal answer with math: 1 < 2 is true."

TOOL_RESULT_MESSAGE = """Tool execution results:
<tool_result>
<tool_name>web_search</tool_name>
<result>found 3 items</result>
</tool_result>
<tool_result>
<tool_name>calculator</tool_name>
<result>42</result>
</tool_result>"""

ALL_CONTENTS = [
    TOOL_USE_SIMPLE,
    TOOL_USE_TRUNCATED,
    TOOL_USE_HTML_IN_PARAM,
    SUB_AGENT,
    PARALLEL_TOOLS,
    PARALLEL_SUB_AGENTS,
    BATCH_AGENT,
    CJK_TAGS,
    MALFORMED_UNBALANCED,
    SUB_AGENT_WITH_HISTORY,
    SUB_AGENT_BAD_HISTORY,
    PLAIN_TEXT,
]
