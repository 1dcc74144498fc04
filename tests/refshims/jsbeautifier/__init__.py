"""jsbeautifier shim: JSON round-trip pretty-printer (output stays
valid JSON, which is all the reference's readers need)."""
import json


class _Options:
    indent_size = 4


def default_options():
    return _Options()


def beautify(text, opts=None):
    return json.dumps(json.loads(text),
                      indent=getattr(opts, "indent_size", 4))
