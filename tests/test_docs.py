"""Documentation freshness: the generated config reference must match the
config dataclasses it documents."""

import os
import re

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def test_config_reference_is_current():
    from diffsheg_tpu.utils.configdocs import generate

    with open(os.path.join(DOCS, "config.md")) as f:
        on_disk = f.read()
    assert on_disk == generate(), (
        "docs/config.md is stale — regenerate with "
        "`python -m diffsheg_tpu.utils.configdocs > docs/config.md`")


def test_config_reference_covers_every_field():
    import dataclasses

    from diffsheg_tpu.config import Config, beat_config
    from diffsheg_tpu.utils.configdocs import generate

    text = generate()
    cfg = beat_config()
    for sec in dataclasses.fields(Config):
        sub = getattr(cfg, sec.name)
        if not dataclasses.is_dataclass(sub):
            continue
        for f in dataclasses.fields(type(sub)):
            assert f"| `{f.name}` |" in text, f"{sec.name}.{f.name} undocumented"


def test_doc_links_resolve():
    """Relative markdown links between the committed docs must point at
    files that exist."""
    link = re.compile(r"\]\(([^)#]+)(?:#[^)]*)?\)")
    for name in os.listdir(DOCS):
        if not name.endswith(".md"):
            continue
        with open(os.path.join(DOCS, name)) as f:
            for target in link.findall(f.read()):
                if "://" in target:
                    continue
                path = os.path.normpath(os.path.join(DOCS, target))
                assert os.path.exists(path), f"{name}: broken link {target}"
