"""Build dist/cefspark.zip for spark-submit --py-files."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    os.makedirs(os.path.join(ROOT, "dist"), exist_ok=True)
    out = os.path.join(ROOT, "dist", "cefspark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "cefspark")
        for fname in sorted(os.listdir(pkg)):
            if fname.endswith(".py"):
                z.write(os.path.join(pkg, fname), f"cefspark/{fname}")
    print(out)


if __name__ == "__main__":
    main()
