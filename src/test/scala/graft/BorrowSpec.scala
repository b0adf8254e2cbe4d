package graft

import org.apache.spark.sql.functions._

/** Borrow lifecycle: severLazy makes a leaf plan whose blocks
  * materialize on first action; release() frees them deterministically
  * (the memory-constrained-session opt-in — after release the frame is
  * dead by contract). */
class BorrowSpec extends SparkSpec {
  import spark.implicits._

  private def checkpointRdds(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  test("severLazy: leaf plan immediately, blocks on first action, release frees them") {
    val df = (1 to 1000).toDF("n").withColumn("sq", col("n") * col("n"))
    val severed = Borrow.severLazy(df)
    // plan is a leaf from the moment it exists
    assert(severed.queryExecution.analyzed.collectLeaves().size == 1)
    assert(severed.count() == 1000) // materializes
    val rdds = checkpointRdds(severed)
    assert(rdds.nonEmpty)
    assert(rdds.forall(_.getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE))
    Borrow.release(severed)
    assert(checkpointRdds(severed).forall(_.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE),
      "release must drop the severed blocks")
  }

  test("release on a plain (non-checkpointed) frame is a no-op") {
    val df = (1 to 10).toDF("n")
    Borrow.release(df) // no LogicalRDD leaves → nothing to do, no throw
    assert(df.count() == 10)
  }
}
