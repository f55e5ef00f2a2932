"""Property test: the Spark preprocessing chain must agree with an
independent pure-Python implementation of the reference semantics
(pdf_reader.py:390-403) on arbitrary text, and be idempotent."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from calculate_file_content_size_for_vector_db_spark.functions.text import preprocess_text

# include the reference's interesting characters: newlines, literal
# backslash-u escapes, mixed case, punctuation
ALPHABET = string.ascii_letters + string.digits + " \n\\u" + "(){}.,"
TEXTS = st.text(alphabet=ALPHABET, max_size=200)


def reference_preprocess(c: str) -> str:
    c = re.sub(r"\n{2,}", "\n", c)
    c = re.sub(r"\n{1,}", " ", c)
    c = re.sub(r"\\u[0-9a-fA-F]{4}", "", c)
    return c.lower()


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=30))
def test_spark_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r.i: r.p for r in df.select("i", preprocess_text("text").alias("p")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == reference_preprocess(t), repr(t)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=30))
def test_preprocess_idempotent_modulo_escapes(spark, texts):
    # after one pass there are no newlines left; a second pass can only
    # strip newly-adjacent literal \uXXXX sequences — on escape-free
    # text the chain is exactly idempotent
    clean = [t for t in texts if "\\u" not in reference_preprocess(t)]
    if not clean:
        return
    df = spark.createDataFrame([(i, t) for i, t in enumerate(clean)], "i long, text string")
    once = df.select("i", preprocess_text("text").alias("p"))
    twice = once.select("i", preprocess_text("p").alias("p"))
    assert {r.i: r.p for r in once.collect()} == {r.i: r.p for r in twice.collect()}
