package graft

import graft.ops.StreamOp
import graft.ops.StreamOp._
import org.scalatest.funsuite.AnyFunSuite

class StreamOpSpec extends AnyFunSuite {

  test("parses the reference's textual descriptors") {
    assert(StreamOp.parse("FILTER:error") == Right(Filter("error")))
    assert(StreamOp.parse("COLUMN_FILTER:Sign_Type:Stop") == Right(ColumnFilter("Sign_Type", "Stop")))
    assert(StreamOp.parse("TRANSFORM:uppercase") == Right(Transform(Uppercase)))
    assert(StreamOp.parse("TRANSFORM:lowercase") == Right(Transform(Lowercase)))
    assert(StreamOp.parse("TRANSFORM:trim") == Right(Transform(TrimLine)))
    assert(StreamOp.parse("TRANSFORM:splitintowords") == Right(SplitIntoWords))
    assert(StreamOp.parse("TRANSFORM:select:X,Y") == Right(Select(Seq("X", "Y"))))
    assert(StreamOp.parse("AGGREGATE") == Right(Aggregate))
  }

  test("strips surrounding quotes like the reference tokenizer (Node.java:417-420)") {
    assert(StreamOp.parse("FILTER:\"Punched Telespar\"") == Right(Filter("Punched Telespar")))
    assert(StreamOp.parse("COLUMN_FILTER:Sign_Type:\"Stop\"") == Right(ColumnFilter("Sign_Type", "Stop")))
  }

  test("FILTER pattern may itself contain a colon") {
    assert(StreamOp.parse("FILTER:a:b") == Right(Filter("a:b")))
  }

  test("rejects malformed descriptors") {
    assert(StreamOp.parse("TRANSFORM:frobnicate").isLeft)
    assert(StreamOp.parse("NOPE").isLeft)
    assert(StreamOp.parse("TRANSFORM:select:").isLeft)
    intercept[IllegalArgumentException](StreamOp.parseUnsafe("NOPE"))
  }

  test("FILTERED_TRANSFORM: the fused O8 descriptor (Operators.java:87-91)") {
    assert(StreamOp.parse("FILTERED_TRANSFORM:error:uppercase") ==
      Right(FilteredTransform("error", Uppercase)))
    assert(StreamOp.parse("FILTERED_TRANSFORM:\"two words\":trim") ==
      Right(FilteredTransform("two words", TrimLine)))
    // only the scalar line transforms fuse (the reference constructor takes
    // Function<String,String>) — generators and projections don't
    assert(StreamOp.parse("FILTERED_TRANSFORM:x:splitintowords").isLeft)
    assert(StreamOp.parse("FILTERED_TRANSFORM:x:select:a,b").isLeft)
  }

  test("FILTERED_TRANSFORM pattern may itself contain a colon (op split off the LAST ':')") {
    assert(StreamOp.parse("FILTERED_TRANSFORM:a:b:uppercase") ==
      Right(FilteredTransform("a:b", Uppercase)))
    assert(StreamOp.parse("FILTERED_TRANSFORM:\"x:y\":trim") ==
      Right(FilteredTransform("x:y", TrimLine)))
    assert(StreamOp.parse("FILTERED_TRANSFORM:nocolon").isLeft)
  }
}
