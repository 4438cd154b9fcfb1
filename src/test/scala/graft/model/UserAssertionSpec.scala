package graft.model

import graft.{SparkTestSession, Store}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** User-assertion add/get/delete + kosher recompute, mirroring the
  * reference `QualityAssertionTests.scala` ("Add and delete user
  * systemAssertions") in /root/reference/src/test. */
class UserAssertionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("add, list, delete, and kosher recompute (QualityAssertionTests:21)") {
    val uuid = "test-uuid-qa-delete1"
    // two users assert the same code → two rows
    val a1 = Store.addUserAssertion(None, spark, uuid,
      AssertionCodes.HABITAT_MISMATCH.code, "user1")
    val a2 = Store.addUserAssertion(Some(a1), spark, uuid,
      AssertionCodes.HABITAT_MISMATCH.code, "user2")
    assert(Store.getUserAssertions(a2, uuid).count() == 2)

    // re-adding the same (rowKey, code, user) is idempotent
    val a2b = Store.addUserAssertion(Some(a2), spark, uuid,
      AssertionCodes.HABITAT_MISMATCH.code, "user2")
    assert(a2b.count() == 2)

    // delete user2's assertion by its uuid
    val user2Uuid = a2.filter(col("userId") === "user2")
      .select("assertionUuid").head().getString(0)
    val afterDelete = Store.deleteUserAssertion(a2, uuid, user2Uuid)
    assert(Store.getUserAssertions(afterDelete, uuid).count() == 1)

    // applying the surviving assertion flips geospatiallyKosher and lands
    // the named assertion on the record
    val records = Seq((uuid, Seq.empty[Int], true, true))
      .toDF("rowKey", "assertionCodes", "geospatiallyKosher",
        "taxonomicallyKosher")
    val applied = Store.applyUserAssertions(records, afterDelete)
    val row = applied.select("geospatiallyKosher", "assertionCodes",
      "assertions").head()
    assert(!row.getBoolean(0))
    assert(row.getSeq[Int](1).contains(AssertionCodes.HABITAT_MISMATCH.code))
    assert(row.getSeq[org.apache.spark.sql.Row](2)
      .exists(_.getAs[String]("name") == AssertionCodes.HABITAT_MISMATCH.name))

    // a record without user assertions keeps its flags
    val other = Seq(("other-row", Seq.empty[Int], true, true))
      .toDF("rowKey", "assertionCodes", "geospatiallyKosher",
        "taxonomicallyKosher")
    assert(Store.applyUserAssertions(other, afterDelete)
      .select("geospatiallyKosher").head().getBoolean(0))
  }
}
