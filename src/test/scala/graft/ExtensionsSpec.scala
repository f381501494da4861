package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftvec.GraftExtensions

class ExtensionsSpec extends SparkSuite {
  test("GraftExtensions wires vec_dot into a SparkSessionExtensions instance") {
    // builder-level behavior is covered functionally by FunctionsSpec's
    // SQL test; here we check the extension applies without error
    // (bad FunctionIdentifier/builder wiring throws at apply time)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
