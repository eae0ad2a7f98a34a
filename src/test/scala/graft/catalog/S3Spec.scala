package graft.catalog

import graft.SparkSpec

class S3Spec extends SparkSpec {

  test("withCredentials scopes keys to the body and restores the old conf") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.access.key", "old-ak")
    conf.unset("fs.s3a.secret.key")
    val out = S3.withCredentials(spark, S3.Credentials("ak", "sk")) {
      assert(conf.get("fs.s3a.access.key") == "ak")
      assert(conf.get("fs.s3a.secret.key") == "sk")
      assert(conf.get("fs.s3a.impl") == "org.apache.hadoop.fs.s3a.S3AFileSystem")
      42
    }
    assert(out == 42)
    // prior values restored: set key back to its old value, unset one gone
    assert(conf.get("fs.s3a.access.key") == "old-ak")
    assert(conf.get("fs.s3a.secret.key") == null)
    conf.unset("fs.s3a.access.key")
  }

  test("restore happens even when the body throws") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.unset("fs.s3.access.key")
    intercept[RuntimeException] {
      S3.withCredentials(spark, S3.Credentials("a", "b"), uriType = "s3") {
        throw new RuntimeException("boom")
      }
    }
    assert(conf.get("fs.s3.access.key") == null)
  }

  test("unrecognized URI type is rejected (the reference's RuntimeError)") {
    intercept[IllegalArgumentException](
      S3.setCredentials(spark, S3.Credentials("a", "b"), uriType = "gs"))
  }

  test("setCredentials is session-lifetime (no restore)") {
    val conf = spark.sparkContext.hadoopConfiguration
    S3.setCredentials(spark, S3.Credentials("ak2", "sk2"), uriType = "s3n")
    assert(conf.get("fs.s3n.access.key") == "ak2")
    assert(conf.get("fs.s3n.secret.key") == "sk2")
    conf.unset("fs.s3n.access.key"); conf.unset("fs.s3n.secret.key")
  }
}
