"""Utility unit tests: JS-compatible JSON numbers, fixed point."""

import math

from swf_renderer_tpu.utils import jsjson
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def test_js_number_formatting():
    cases = [
        (1.0, "1"),
        (-0.0, "0"),
        (0.2, "0.2"),
        (51 / 255, "0.2"),
        (1867.5, "1867.5"),
        (127 / 255, "0.4980392156862745"),
        (float("nan"), "null"),
        (float("inf"), "null"),
        (True, "true"),
        (42, "42"),
    ]
    for value, want in cases:
        assert jsjson.format_number(value) == want, value


def test_stringify_structures():
    assert jsjson.stringify({}) == "{}"
    assert jsjson.stringify([]) == "[]"
    assert jsjson.stringify({"a": [1, 2.5]}) == (
        '{\n  "a": [\n    1,\n    2.5\n  ]\n}'
    )
    assert jsjson.stringify({"s": 'q"\\\n'}) == '{\n  "s": "q\\"\\\\\\n"\n}'


def test_sfixed16p16():
    one = Sfixed16P16.from_value(1.0)
    assert one.epsilons == 65536
    assert float(one) == 1.0
    x = Sfixed16P16.from_epsilons(508060)
    assert math.isclose(x.value(), 7.75238037109375)
