"""Generate docs/models.md from model introspection.

Run after changing any model's attribute table:
    python docs/make_model_descriptions.py
"""

from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sanafe_tpu.models import FRAMEWORK_ATTRIBUTES, get_builtin_models

OUTPUT = Path(__file__).parent / "models.md"

HEADER = """# Models

Every pipeline model available in sanafe_tpu, generated from the model
registry (`sanafe_tpu.get_builtin_models()`). Framework attributes are
accepted by every model; each model section lists its specific attributes.
"""


def attribute_table(attributes: dict) -> str:
    lines = ["| Attribute | Description |", "|---|---|"]
    for name, description in sorted(attributes.items()):
        lines.append(f"| `{name}` | {description or '—'} |")
    return "\n".join(lines)


def main() -> None:
    sections = [HEADER, "## Framework attributes\n"]
    sections.append(attribute_table(FRAMEWORK_ATTRIBUTES))
    for model_name, attributes in sorted(get_builtin_models().items()):
        sections.append(f"\n## {model_name}\n")
        if attributes:
            sections.append(attribute_table(attributes))
        else:
            sections.append("No model-specific attributes.")
    OUTPUT.write_text("\n".join(sections) + "\n")
    print(f"wrote {OUTPUT}")


if __name__ == "__main__":
    main()
